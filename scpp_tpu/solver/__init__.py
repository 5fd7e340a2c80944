from scpp_tpu.solver.affine import Aff, Var, concat  # noqa: F401
from scpp_tpu.solver.builder import ConeProblemBuilder, ConicProgram  # noqa: F401
from scpp_tpu.solver.scs import SolverSettings, SolverResult, solve_conic  # noqa: F401
