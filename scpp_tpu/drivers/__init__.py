from scpp_tpu.drivers.closed_loop import (  # noqa: F401
    lqr_sim, mpc_sim, sc_sim, sc_tracking,
)
