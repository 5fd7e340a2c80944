"""`python -m scpp_tpu.drivers.sc_sim` — see drivers/cli.py."""

from scpp_tpu.drivers.cli import run_sc_sim

if __name__ == "__main__":
    run_sc_sim()
