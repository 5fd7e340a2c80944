"""`python -m scpp_tpu.drivers.sc_tracking` — see drivers/cli.py."""

from scpp_tpu.drivers.cli import run_sc_tracking

if __name__ == "__main__":
    run_sc_tracking()
