from scpp_tpu.algos.scvx import SCvxResult, solve_scvx  # noqa: F401
