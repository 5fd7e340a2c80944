"""`python -m scpp_tpu.drivers.mpc_sim` — see drivers/cli.py."""

from scpp_tpu.drivers.cli import run_mpc_sim

if __name__ == "__main__":
    run_mpc_sim()
