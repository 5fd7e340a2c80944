"""SC: free-final-time successive convexification with soft trust regions.

Behavioral parity with the reference SCAlgorithm/SCProblem
(scpp_core/src/SCAlgorithm.cpp:14-253, SCProblem.cpp:6-140), the
Szmuk/Acikmese-style algorithm behind SC_oneshot/SC_sim:

  - time normalized to [0, 1]; sigma (the final time) is a variable that
    scales the dynamics, entering the linearized constraint through the
    s_k column (SCProblem.cpp:53-56),
  - L1 virtual control with weight w_nu,
  - sigma trust region (sigma - sigma0)^2 <= delta_sigma as a rotated
    SOC (SCProblem.cpp:79-101),
  - per-node combined state+input 2-norm trust region <= delta_k
    (SCProblem.cpp:103-126),
  - cost = w_t sigma + w_nu ||nu||_1 + w_sigma delta_sigma + w_tr sum delta,
  - w_tr doubles whenever ||nu||_1 < nu_tol (SCAlgorithm.cpp:112-115),
  - converged iff sum delta < delta_tol and ||nu||_1 < nu_tol
    (SCAlgorithm.cpp:131).

TPU-native redesign mirrors algos/scvx.py: the whole solve is one jitted
``lax.scan`` over max_iterations with convergence masking, so scenario
batches run in lockstep under vmap. Solver failure becomes a per-scenario
residual diagnostic instead of std::terminate (SCAlgorithm.cpp:94-98).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from scpp_tpu.algos.common import (interval_resimulation,
                                   linear_defect_cost, tree_select)
from scpp_tpu.algos.staged_problems import build_sc_subproblem_staged
from scpp_tpu.configs.algorithms import SCConfig
from scpp_tpu.ops.discretization import multiple_shooting
from scpp_tpu.solver import Aff, ConeProblemBuilder, concat, solve
from scpp_tpu.solver.ipm_staged import StagedSolverResult, solve_staged_ipm
from scpp_tpu.trajectory import DiscretizationData, TrajectoryData

__all__ = ["SCResult", "solve_sc", "build_sc_subproblem"]


@struct.dataclass
class SCResult:
    td: TrajectoryData
    converged: jnp.ndarray
    iterations: jnp.ndarray
    # per-iteration history (max_iterations entries)
    all_X: jnp.ndarray
    all_U: jnp.ndarray
    all_t: jnp.ndarray
    norm1_nu: jnp.ndarray
    sum_delta: jnp.ndarray
    delta_sigma: jnp.ndarray
    defect_pattern: jnp.ndarray   # (iters, K-1) bool, SCAlgorithm.cpp:234-253
    max_residual: jnp.ndarray


def build_sc_subproblem(model, params, td: TrajectoryData,
                        dd: DiscretizationData, weights, ref,
                        free_final_time: bool, l1_split: bool = True):
    """The SC convex subproblem (SCProblem.cpp:6-140 + model constraints).

    ``weights`` = (w_time, w_tr_time, w_tr_traj, w_nu) as traced scalars.
    ``l1_split`` selects the nu = nu+ - nu- L1 encoding (identical optimum,
    fewer variables) over the reference's bound+sum epigraph.
    """
    w_time, w_tr_time, w_tr_traj, w_nu = weights
    K = td.n_X
    n_U = td.n_U
    n, m = model.state_dim, model.input_dim
    foh = td.interpolated_input

    pb = ConeProblemBuilder()
    X = pb.add_variable("X", K, n)
    U = pb.add_variable("U", n_U, m)
    if l1_split:
        nup = pb.add_variable("nu_pos", K - 1, n)
        nun = pb.add_variable("nu_neg", K - 1, n)
    else:
        nu = pb.add_variable("nu", K - 1, n)
        nub = pb.add_variable("nu_bound", K - 1, n)
        norm1 = pb.add_variable("norm1_nu")
    delta = pb.add_variable("delta", K)
    if free_final_time:
        sigma = pb.add_variable("sigma")
        dsigma = pb.add_variable("delta_sigma")
        # minimize total time; sigma >= 0.001 (SCProblem.cpp:32-34)
        pb.add_cost(sigma[...] * w_time)
        pb.add_nonneg(sigma[...] - 0.001)

    # linearized dynamics (SCProblem.cpp:37-59)
    for k in range(K - 1):
        lhs = (X.place(dd.A[k], k) + U.place(dd.B[k], k)
               - X[k + 1] + dd.z[k])
        lhs = lhs + (nup[k] - nun[k] if l1_split else nu[k])
        if foh:
            lhs = lhs + U.place(dd.C[k], k + 1)
        if free_final_time:
            # s_k column times the scalar sigma variable
            lhs = lhs + sigma.place(dd.s[k][:, None])
        pb.add_eq(lhs)

    # L1 virtual control (SCProblem.cpp:61-77)
    if l1_split:
        pb.add_nonneg(nup[...])
        pb.add_nonneg(nun[...])
        pb.add_cost((nup[...].sum() + nun[...].sum()) * w_nu)
    else:
        pb.add_nonneg(nub[...] - nu[...])
        pb.add_nonneg(nu[...] + nub[...])
        pb.add_nonneg(norm1[...] - nub[...].sum())
        pb.add_cost(norm1[...] * w_nu)

    if free_final_time:
        # sigma trust region (sigma - sigma0)^2 <= delta_sigma as
        # || [0.5 - 0.5 dsigma; sigma0 - sigma] || <= 0.5 + 0.5 dsigma
        # (SCProblem.cpp:79-101)
        t_aff = dsigma[...] * 0.5 + 0.5
        z_aff = concat([dsigma[...] * (-0.5) + 0.5,
                        -sigma[...] + td.t])
        pb.add_soc(t_aff, z_aff)
        pb.add_cost(dsigma[...] * w_tr_time)

    # per-node combined state+input trust region (SCProblem.cpp:103-126)
    for k in range(K):
        parts = [X[k] - td.X[k]]
        if foh or k < K - 1:
            parts.append(U[k] - td.U[k])
        pb.add_soc(delta[k], concat(parts))
    pb.add_cost(delta[...].sum() * w_tr_traj)

    model.constraints(pb, X, U, params, ref)
    return pb.build(td.X.dtype)


@partial(jax.jit, static_argnums=(0, 2))
def solve_sc(model, params, cfg: SCConfig = SCConfig(),
             warm_td: TrajectoryData = None) -> SCResult:
    """Full SC solve as one jitted function (SCAlgorithm.cpp:134-189)."""
    if cfg.nondimensionalize:
        params = model.nondimensionalize(params)
    par = model.param_vector(params)

    if warm_td is None:
        td0 = model.init_trajectory(params, cfg.K, cfg.interpolate_input)
    else:
        td0 = (model.scale_trajectory(params, warm_td)
               if cfg.nondimensionalize else warm_td)

    ref = model.constraint_ref(params, td0)
    dtype = td0.X.dtype
    fft = cfg.free_final_time

    def step(carry, _):
        td, w_tr, iters, converged, done, warm, has_warm = carry

        dd = multiple_shooting(model, par, td, substeps=cfg.substeps,
                               method=cfg.integrator, variable_time=fft)
        weights = (jnp.asarray(cfg.weight_time, dtype),
                   jnp.asarray(cfg.weight_trust_region_time, dtype),
                   w_tr,
                   jnp.asarray(cfg.weight_virtual_control, dtype))
        if cfg.backend == "staged":
            if not cfg.l1_split:
                raise ValueError("backend='staged' requires l1_split=True "
                                 "(the norm1_nu epigraph is not stage-local)")
            prog = build_sc_subproblem_staged(model, params, td, dd, weights,
                                              ref, fft)
            # cross-iteration IPM warm start (no ECOS analog — the
            # reference cold-starts every solve, SCAlgorithm.cpp:78)
            res = solve_staged_ipm(prog, cfg.solver,
                                   warm if cfg.warm_start else None,
                                   has_warm)
        else:
            prog = build_sc_subproblem(model, params, td, dd, weights, ref,
                                       fft, cfg.l1_split)
            res = solve(prog, cfg.solver)

        new_t = prog.extract(res.x, "sigma") if fft else td.t
        new_td = td.replace(X=prog.extract(res.x, "X"),
                            U=prog.extract(res.x, "U"),
                            t=new_t)
        # ||nu||_1 from the linear defect of the returned iterate, not the
        # nu variables — identical at an exact optimum, noise-free under
        # inexact conic solves (see linear_defect_cost)
        norm1 = linear_defect_cost(new_td, dd,
                                   sigma=new_t if fft else None)
        sum_delta = jnp.sum(prog.extract(res.x, "delta"))
        dsig = prog.extract(res.x, "delta_sigma") if fft \
            else jnp.zeros((), dtype)

        # defect pattern diagnostic (SCAlgorithm.cpp:234-253)
        x_end = interval_resimulation(model, par, new_td, cfg.sim_substeps,
                                      cfg.integrator)
        defects = jnp.sum((x_end - new_td.X[1:]) ** 2, axis=1) > cfg.nu_tol

        # adapt trust-region weight (SCAlgorithm.cpp:112-115)
        w_tr_new = jnp.where(norm1 < cfg.nu_tol, w_tr * 2.0, w_tr)

        conv_now = (sum_delta < cfg.delta_tol) & (norm1 < cfg.nu_tol)

        # per-scenario failure masking (SURVEY §5): freeze on non-finite
        # subproblem output instead of the reference's std::terminate
        step_ok = (jnp.all(jnp.isfinite(new_td.X))
                   & jnp.all(jnp.isfinite(new_td.U))
                   & jnp.isfinite(new_t))
        conv_now = conv_now & step_ok

        keep = jnp.logical_not(done) & step_ok
        td_next = tree_select(keep, new_td, td)
        w_tr_next = jnp.where(keep, w_tr_new, w_tr)
        iters_next = iters + jnp.where(keep, 1, 0)
        converged_next = converged | (conv_now & keep)
        done_next = done | conv_now

        if cfg.backend == "staged" and cfg.warm_start:
            warm_good = step_ok & jnp.all(
                jnp.isfinite(jnp.stack([res.res_pri, res.res_dua])))
            warm_next = jax.tree_util.tree_map(
                lambda n, o: jnp.where(warm_good & jnp.logical_not(done),
                                       n, o), res, warm)
            has_warm_next = has_warm | (warm_good & jnp.logical_not(done))
        else:
            warm_next, has_warm_next = warm, has_warm

        out = (td_next.X, td_next.U, td_next.t, norm1, sum_delta, dsig,
               defects,
               jnp.maximum(res.res_pri, res.res_dua))
        return (td_next, w_tr_next, iters_next, converged_next, done_next,
                warm_next, has_warm_next), out

    if cfg.backend == "staged" and cfg.warm_start:
        dd0 = multiple_shooting(model, par, td0, substeps=cfg.substeps,
                                method=cfg.integrator, variable_time=fft)
        w0 = (jnp.asarray(cfg.weight_time, dtype),
              jnp.asarray(cfg.weight_trust_region_time, dtype),
              jnp.asarray(cfg.weight_trust_region_trajectory, dtype),
              jnp.asarray(cfg.weight_virtual_control, dtype))
        prog0 = build_sc_subproblem_staged(model, params, td0, dd0, w0,
                                           ref, fft)
        z = jnp.zeros
        warm0 = StagedSolverResult(
            x_stage=z((prog0.K, prog0.w), dtype), x_glob=z((prog0.g,), dtype),
            obj=z((), dtype), res_pri=z((), dtype), res_dua=z((), dtype),
            res_gap=z((), dtype),
            y_stage=z((prog0.K, prog0.me), dtype),
            y_glob=z((prog0.A_geq.shape[0],), dtype),
            z_stage=z((prog0.K, prog0.h.shape[1]), dtype),
            z_glob=z((prog0.h_g.shape[0],), dtype))
    else:
        warm0 = jnp.asarray(0.0, dtype)

    carry0 = (td0, jnp.asarray(cfg.weight_trust_region_trajectory, dtype),
              jnp.asarray(0, jnp.int32), jnp.asarray(False),
              jnp.asarray(False), warm0, jnp.asarray(False))
    (td, _, iters, converged, _, _, _), ys = jax.lax.scan(
        step, carry0, None, length=cfg.max_iterations)
    all_X, all_U, all_t, norm1s, sum_deltas, dsigs, defect_patterns, resids = ys

    if cfg.nondimensionalize:
        td = model.unscale_trajectory(params, td)

    return SCResult(
        td=td, converged=converged, iterations=iters,
        all_X=all_X, all_U=all_U, all_t=all_t,
        norm1_nu=norm1s, sum_delta=sum_deltas, delta_sigma=dsigs,
        defect_pattern=defect_patterns,
        max_residual=jnp.max(resids),
    )
