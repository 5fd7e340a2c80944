"""Stage-banded SC / SCvx subproblem builders.

The TPU speed path for the trajectory subproblems (round-1 review items
1 and 8): the same convex programs as algos/sc.py::build_sc_subproblem and
algos/scvx.py::build_scvx_subproblem (SCProblem.cpp:6-140,
SCvxProblem.cpp:6-73 + model application constraints), but emitted as a
:class:`~scpp_tpu.solver.staged.StagedProgram`:

  - constraints are vectorized *families* over nodes — one scatter per
    (family, term) instead of one per row, so the traced HLO is tiny and
    XLA compile time drops from minutes to seconds at K=30;
  - rows stay grouped by stage, which the block-tridiagonal (+ arrow)
    KKT factorization in solver/ipm_staged.py consumes at O(K w^3)
    instead of the dense O((K w)^3).

The virtual control uses the stage-local epigraph encoding (see
_dynamics_and_l1): the reference's norm1_nu epigraph
(SCvxProblem.cpp:40-56) sums |nu| over ALL nodes into one scalar row,
which is not stage-local.  All three encodings (reference epigraph,
nu+/nu- split, defect epigraph) have the identical optimum
(equivalence-tested against the reference encoding on the dense backend,
tests/test_scvx.py, tests/test_staged_backend.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from scpp_tpu.solver.affine import concat
from scpp_tpu.solver.staged import StagedBuilder, node_concat
from scpp_tpu.trajectory import DiscretizationData, TrajectoryData

__all__ = ["build_sc_subproblem_staged", "build_scvx_subproblem_staged"]


def _base_builder(model, td: TrajectoryData, with_delta: bool):
    """Common variable block: X, U, virtual-control epigraph (+ delta)."""
    K, n_U = td.n_X, td.n_U
    n, m = model.state_dim, model.input_dim
    sb = StagedBuilder(K)
    x = sb.stage_var("X", n)
    u = sb.stage_var("U", m, n_nodes=n_U)
    nu_abs = sb.stage_var("nu_abs", n, n_nodes=K - 1)
    delta = sb.stage_var("delta", 1) if with_delta else None
    return sb, x, u, nu_abs, delta


def _dynamics_and_l1(sb, x, u, nu_abs, dd: DiscretizationData, w_nu,
                     foh: bool, sig_ref=None):
    """Linearized dynamics + L1 virtual control as a direct epigraph
    (SCProblem.cpp:37-77 / SCvxProblem.cpp:22-56).

    TPU redesign of the encoding: the reference (and the dense oracle
    backend) carries an explicit virtual control nu in the dynamics
    EQUALITY x_{k+1} = A x_k + B u_k (+...) + nu and penalizes |nu| via
    auxiliary variables.  Here the defect r_k = A x_k + B u_k (+ C u_{k+1})
    (+ s sigma) + z - x_{k+1} is penalized directly through the standard
    epigraph pair  -t <= r <= t, cost w_nu * sum(t):  identical optimum
    (t* = |r*| = |nu*|), but the stage KKT block shrinks from
    (x, u, nu+, nu-) columns + n equality rows to (x, u, t) columns and
    ZERO dynamics equality rows — the adjacent-node coupling moves into
    the two nonneg cone families, which the block-tridiagonal Gram
    already handles.  At RocketQuat K=30 sizes this cuts the factor
    flops ~3x and was measured ~2x on the whole IPM iteration.
    """
    K = sb.K
    r = x.lin(dd.A) + u.lin(dd.B) - x.next.sel() + dd.z
    if foh:
        r = r + u.next.lin(dd.C)
    if sig_ref is not None:
        r = r + sig_ref.node_lin(dd.s[:, :, None])

    kn = np.arange(K - 1)
    sb.nonneg(nu_abs.sel() - r, nodes=kn)
    sb.nonneg(nu_abs.sel() + r, nodes=kn)
    sb.cost(nu_abs.sel().sum() * w_nu, nodes=kn)


def build_sc_subproblem_staged(model, params, td: TrajectoryData,
                               dd: DiscretizationData, weights, ref,
                               free_final_time: bool):
    """Stage-banded SC subproblem (SCProblem.cpp:6-140 + model constraints).

    ``weights`` = (w_time, w_tr_time, w_tr_traj, w_nu) as traced scalars,
    identical to build_sc_subproblem.
    """
    w_time, w_tr_time, w_tr_traj, w_nu = weights
    K, n_U = td.n_X, td.n_U
    foh = td.interpolated_input

    sb, x, u, nu_abs, delta = _base_builder(model, td, with_delta=True)
    sig_ref = None
    if free_final_time:
        sigma, sig_ref = sb.global_var("sigma")
        dsigma, _ = sb.global_var("delta_sigma")
        # minimize total time; sigma >= 0.001 (SCProblem.cpp:32-34)
        sb.g_cost(sigma[...] * w_time)
        sb.g_nonneg(sigma[...] - 0.001)

    _dynamics_and_l1(sb, x, u, nu_abs, dd, w_nu, foh, sig_ref)

    if free_final_time:
        # sigma trust region (sigma - sigma0)^2 <= delta_sigma as
        # || [0.5 - 0.5 dsigma; sigma0 - sigma] || <= 0.5 + 0.5 dsigma
        # (SCProblem.cpp:79-101)
        sb.g_soc(dsigma[...] * 0.5 + 0.5,
                 concat([dsigma[...] * (-0.5) + 0.5,
                         -sigma[...] + td.t]))
        sb.g_cost(dsigma[...] * w_tr_time)

    # per-node combined state+input trust region <= delta_k
    # (SCProblem.cpp:103-126); under ZOH the last node has no input
    if foh:
        sb.soc(delta.sel(0), node_concat([x.sel() - td.X, u.sel() - td.U]))
    else:
        sb.soc(delta.sel(0),
               node_concat([x.sel() - td.X[:-1], u.sel() - td.U]),
               nodes=np.arange(K - 1))
        sb.soc(delta.sel(0), x.sel() - td.X[K - 1], nodes=[K - 1])
    sb.cost(delta.sel(0) * w_tr_traj)

    model.constraints_staged(sb, x, u, params, ref, n_U)
    return sb.build(td.X.dtype)


def build_scvx_subproblem_staged(model, params, td: TrajectoryData,
                                 dd: DiscretizationData, trust_region,
                                 weight_nu, ref,
                                 state_trust_region=None):
    """Stage-banded SCvx subproblem (SCvxProblem.cpp:6-73 + model
    constraints): fixed final time, hard per-node input trust region."""
    K, n_U = td.n_X, td.n_U
    foh = td.interpolated_input

    sb, x, u, nu_abs, _ = _base_builder(model, td, with_delta=False)
    _dynamics_and_l1(sb, x, u, nu_abs, dd, weight_nu, foh, None)

    # hard per-node input trust region ||u - u0|| <= r (SCvxProblem.cpp:58-68)
    un = np.arange(n_U)
    sb.soc(trust_region, u.sel() - td.U, nodes=un)

    # optional per-node state trust region (SCvxConfig.state_trust_region)
    if state_trust_region is not None:
        sb.soc(state_trust_region, x.sel() - td.X)

    model.constraints_staged(sb, x, u, params, ref, n_U)
    return sb.build(td.X.dtype)
