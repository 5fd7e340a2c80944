from scpp_tpu.parallel.scenarios import (  # noqa: F401
    disperse_initial_state, make_scenario_mesh, solve_batch,
)
