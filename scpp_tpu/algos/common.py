"""Shared algorithm helpers."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from scpp_tpu.ops.simulation import simulate
from scpp_tpu.trajectory import TrajectoryData

__all__ = ["tree_select", "interval_resimulation", "nonlinear_defect_cost",
           "linear_defect_cost"]


def tree_select(pred, a, b):
    """Elementwise pytree select: pred ? a : b (pred is a scalar bool)."""
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


def interval_resimulation(model, par, td: TrajectoryData, substeps: int = 12,
                          method: str = "dopri5"):
    """Propagate each interval's start state nonlinearly to its end.

    The building block of both the defect pattern (SCAlgorithm.cpp:234-253)
    and the SCvx nonlinear cost (SCvxAlgorithm.cpp:262-278), vmapped over
    the K-1 intervals.
    """
    K = td.n_X
    dt = td.t / (K - 1)
    u0s = td.U[: K - 1]
    u1s = td.U[1:K] if td.interpolated_input else u0s

    def prop(x0, u0, u1):
        return simulate(model, par, dt, u0, u1, x0, substeps, method)

    return jax.vmap(prop)(td.X[:-1], u0s, u1s)


def nonlinear_defect_cost(model, par, td: TrajectoryData, substeps: int = 12,
                          method: str = "dopri5"):
    """J = sum_k || resim(x_k) - x_{k+1} ||_1 (SCvxAlgorithm.cpp:262-278)."""
    x_end = interval_resimulation(model, par, td, substeps, method)
    return jnp.sum(jnp.abs(x_end - td.X[1:]))


def linear_defect_cost(td: TrajectoryData, dd, sigma=None):
    """L = sum_k || A x_k + B u_k (+ C u_{k+1}) (+ s sigma) + z - x_{k+1} ||_1
    of a subproblem *solution* — the linear-model analog of
    :func:`nonlinear_defect_cost`.

    At an exact subproblem optimum this equals the reference's norm1_nu
    (the optimal virtual control is exactly the linear defect of X, U;
    SCvxProblem.cpp:40-56).  Reading it off the returned trajectory instead
    of the nu variables matters under an *inexact* conic solve: the split
    nu+ - nu- (or epigraph) variables sit mu-deep in the cone interior, so
    norm1_nu carries solver-gap noise that scales with the trust radius —
    which corrupted the ratio test into accepting divergent steps (L and J
    grew in lockstep with rho ~ 1 until NaN).  The linear defect of the
    actual (X, U) iterate is exact regardless of solver accuracy.
    """
    x_pred = (jnp.einsum("kij,kj->ki", dd.A, td.X[:-1])
              + jnp.einsum("kij,kj->ki", dd.B, td.U[: td.n_X - 1])
              + dd.z)
    if td.interpolated_input:
        x_pred = x_pred + jnp.einsum("kij,kj->ki", dd.C, td.U[1:])
    if sigma is not None:
        x_pred = x_pred + dd.s * sigma
    return jnp.sum(jnp.abs(x_pred - td.X[1:]))
