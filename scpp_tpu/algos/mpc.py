"""Linear receding-horizon SOCP MPC.

Behavioral parity with the reference MPCProblem/MPCAlgorithm
(scpp_core/src/MPCProblem.cpp:6-89, MPCAlgorithm.cpp:11-141): dynamics
linearized once about the model operating point with the exact ZOH
discretization (matrix exponential, dt = time_horizon/(K-1)), then a
fixed SOCP re-solved each control step with only ``x_init`` changing —
the canonical "parameterized re-solve" that here is simply a jitted
function of (params, x_init, x_final).

Cost: || w_terminal o (x_K - x_final) ||_2 (+ intermediate-node rows when
enabled, re-derived cleanly — the reference's intermediate-cost indexing
bug at MPCProblem.cpp:64-68 is not replicated) + || w_u o u ||_2, each via
a scalar epigraph variable.

Note: the reference's per-model config disables ``constrain_initial_final``
for MPC/LQR runs (config/Rocket2D/model.info comment); pass model params
with that flag off.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from scpp_tpu.configs.algorithms import MPCConfig
from scpp_tpu.ops.discretization import exact_linear_discretization
from scpp_tpu.solver import ConeProblemBuilder, concat, solve

__all__ = ["build_mpc_subproblem", "mpc_solve"]


def build_mpc_subproblem(model, cfg: MPCConfig, A, B, z, x_init, x_final,
                         params, ref=(), dtype=None):
    """The MPC SOCP (MPCProblem.cpp:6-89 + model constraints)."""
    K = cfg.K
    n, m = model.state_dim, model.input_dim
    dtype = dtype or x_init.dtype

    pb = ConeProblemBuilder()
    X = pb.add_variable("X", K, n)
    U = pb.add_variable("U", K - 1, m)
    err = pb.add_variable("error_cost")
    inp = pb.add_variable("input_cost")

    # initial state pinned (MPCProblem.cpp:28-31, added once, not n times)
    pb.add_eq(X[0] - x_init)

    # time-invariant linear dynamics (MPCProblem.cpp:33-55)
    for k in range(K - 1):
        pb.add_eq(X.place(A, k) + U.place(B, k) - X[k + 1] + z)

    # error cost epigraph (MPCProblem.cpp:57-72)
    w_term = jnp.asarray(cfg.state_weights_terminal, dtype)
    parts = []
    if cfg.intermediate_cost_active:
        w_int = jnp.asarray(cfg.state_weights_intermediate, dtype)
        for k in range(1, K - 1):
            parts.append((X[k] - x_final) * w_int)
    parts.append((X[K - 1] - x_final) * w_term)
    pb.add_soc(err[...], concat(parts))
    pb.add_cost(err[...])

    # input cost epigraph (MPCProblem.cpp:74-84)
    w_u = jnp.asarray(cfg.input_weights, dtype)
    pb.add_soc(inp[...], concat([U[k] * w_u for k in range(K - 1)]))
    pb.add_cost(inp[...])

    model.constraints(pb, X, U, params, ref)
    return pb.build(dtype)


@partial(jax.jit, static_argnums=(0, 3))
def mpc_solve(model, params, x_init, cfg: MPCConfig = MPCConfig(),
              x_final=None, warm=None):
    """One receding-horizon solve: returns (X, U, result).

    Linearization happens about the operating point each call
    (MPCAlgorithm.cpp:45-52 does it once at init; under jit the expm is
    constant-folded when params are literals, and correct when they are
    dispersed per scenario).

    ``warm`` (a previous SolverResult) warm-starts the first-order
    backend when ``cfg.solver`` is a SolverSettings with
    ``warm_start=True`` — the natural fit for the re-solve pattern where
    only ``x_init`` moves between calls (MPCAlgorithm.cpp:93-116).
    """
    par = model.param_vector(params)
    if x_final is None:
        x_final = params.x_final
    x_eq, u_eq = model.operating_point(params)
    dt = cfg.time_horizon / (cfg.K - 1)
    A, B, z = exact_linear_discretization(model, par, dt, x_eq, u_eq)
    ref = model.constraint_ref(
        params, model.init_trajectory(params, cfg.K, False))
    prog = build_mpc_subproblem(model, cfg, A, B, z, x_init, x_final,
                                params, ref)
    res = solve(prog, cfg.solver, warm)
    return prog.extract(res.x, "X"), prog.extract(res.x, "U"), res
