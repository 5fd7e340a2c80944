"""`python -m scpp_tpu.drivers.sc_oneshot` — see drivers/cli.py."""

from scpp_tpu.drivers.cli import run_sc_oneshot

if __name__ == "__main__":
    run_sc_oneshot()
