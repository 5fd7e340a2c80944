"""`python -m scpp_tpu.drivers.lqr_sim` — see drivers/cli.py."""

from scpp_tpu.drivers.cli import run_lqr_sim

if __name__ == "__main__":
    run_lqr_sim()
