from scpp_tpu.ops.integrators import integrate_fixed, rk_step  # noqa: F401
from scpp_tpu.ops.simulation import simulate  # noqa: F401
from scpp_tpu.ops.discretization import multiple_shooting, exact_linear_discretization  # noqa: F401
