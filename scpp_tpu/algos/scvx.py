"""SCvx: successive convexification with a hard trust region & ratio test.

Behavioral parity with the reference SCvxAlgorithm/SCvxProblem
(scpp_core/src/SCvxAlgorithm.cpp:15-278, SCvxProblem.cpp:6-73): fixed
final time, L1 virtual control, per-node input trust region
||u - u0|| <= r, accept/reject on the nonlinear-vs-linear cost ratio
rho = (J_last - J_new) / (J_last - L_new), radius /= alpha on reject or
rho < rho_1, radius *= beta on rho >= rho_2, convergence when
|J_last - L| < change_threshold.

TPU-native redesign: the whole solve is a single jitted ``lax.scan`` over a
fixed solve budget. One scan step = discretize -> conic solve -> resimulate
-> masked accept/reject update, so a batch of scenarios runs the loop in
lockstep with per-scenario masks instead of divergent control flow
(SURVEY §7 "while-loop + reject semantics under vmap"). Rejected steps
recompute the identical discretization (td unchanged) rather than caching
it — pure-function semantics at the price of a cheap redundant vmap.

Beyond the reference (which std::terminate's on solver failure,
SCvxAlgorithm.cpp:87-91), a failed conic solve — non-finite iterate, or an
iterate whose *linear* cost exceeds the incumbent's nonlinear cost (only
reachable via an unclosed duality gap) — is masked per scenario: the step
is rejected, the radius shrinks, and the previous trajectory and cost
survive. See the failure-masking block in ``step``.

Reference quirks kept for numeric parity:
  - the first subproblem solve is accepted unconditionally
    (SCvxAlgorithm.cpp:109-113),
  - ``last_nonlinear_cost`` is overwritten even when the step is rejected
    (SCvxAlgorithm.cpp:118),
  - the linearization point of exact_minimum_thrust refreshes once per
    solve, not per iteration (rocketQuat.hpp:87-94, SCAlgorithm.cpp:152).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from scpp_tpu.algos.common import (linear_defect_cost, nonlinear_defect_cost,
                                   tree_select)
from scpp_tpu.algos.staged_problems import build_scvx_subproblem_staged
from scpp_tpu.configs.algorithms import SCvxConfig
from scpp_tpu.ops.discretization import multiple_shooting
from scpp_tpu.solver import Aff, ConeProblemBuilder, solve
from scpp_tpu.solver.ipm_staged import StagedSolverResult, solve_staged_ipm
from scpp_tpu.trajectory import DiscretizationData, TrajectoryData

__all__ = ["SCvxResult", "solve_scvx", "build_scvx_subproblem"]


@struct.dataclass
class SCvxResult:
    td: TrajectoryData            # final (accepted) trajectory
    converged: jnp.ndarray        # bool
    iterations: jnp.ndarray       # number of accepted iterations
    trust_region: jnp.ndarray     # final radius
    # per-step history (solve_budget entries; slots past `steps` hold the
    # values of the last executed step)
    all_X: jnp.ndarray
    all_U: jnp.ndarray
    accepted: jnp.ndarray         # which steps were accepted
    nonlinear_cost: jnp.ndarray   # J after each step
    linear_cost: jnp.ndarray      # L = ||nu||_1 after each step
    res_pri: jnp.ndarray          # conic primal residual per step
    res_dua: jnp.ndarray          # conic dual residual per step
    steps: jnp.ndarray            # number of executed subproblem solves
    # failure diagnostics (survive divergence — SURVEY §5 failure detection)
    max_residual: jnp.ndarray     # worst *finite* conic residual seen
    first_failure: jnp.ndarray    # step index of first masked failure (-1)


def build_scvx_subproblem(model, params, td: TrajectoryData,
                          dd: DiscretizationData, trust_region, weight_nu,
                          ref, l1_split: bool = True,
                          state_trust_region=None):
    """The SCvx convex subproblem (SCvxProblem.cpp:6-73 + model constraints).

    ``l1_split=True`` encodes the L1 virtual-control penalty with the
    standard positive/negative split nu = nu+ - nu- (24% fewer variables
    and rows than the reference's bound+sum epigraph chain; identical
    optimum and identical ||nu||_1 value at the solution). ``False``
    reproduces the reference's nu_bound/norm1_nu encoding verbatim.
    """
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

    # linearized dynamics x_{k+1} = A x_k + B u_k (+ C u_{k+1}) + z + nu
    for k in range(K - 1):
        lhs = (X.place(dd.A[k], k) + U.place(dd.B[k], k)
               - X[k + 1] + dd.z[k])
        lhs = lhs + (nup[k] - nun[k] if l1_split else nu[k])
        if foh:
            lhs = lhs + U.place(dd.C[k], k + 1)
        pb.add_eq(lhs)

    if l1_split:
        pb.add_nonneg(nup[...])
        pb.add_nonneg(nun[...])
        pb.add_cost((nup[...].sum() + nun[...].sum()) * weight_nu)
    else:
        # reference L1 epigraph (SCvxProblem.cpp:40-56)
        pb.add_nonneg(nub[...] - nu[...])
        pb.add_nonneg(nu[...] + nub[...])
        pb.add_nonneg(norm1[...] - nub[...].sum())
        pb.add_cost(norm1[...] * weight_nu)

    # hard per-node input trust region ||u - u0|| <= r
    for k in range(n_U):
        pb.add_soc(Aff.constant(trust_region), U[k] - td.U[k])

    # optional per-node state trust region (see SCvxConfig.state_trust_region)
    if state_trust_region is not None:
        for k in range(K):
            pb.add_soc(Aff.constant(state_trust_region), X[k] - td.X[k])

    model.constraints(pb, X, U, params, ref)
    return pb.build(td.X.dtype)


def extract_norm1_nu(prog, x, l1_split: bool = True):
    """||nu||_1 of a subproblem solution under either L1 encoding.

    In split mode the actual virtual control is nu+ - nu-; summing the
    split variables would add the (mu-level) interior overlap, so the
    exact norm is computed from their difference."""
    if l1_split:
        nu = prog.extract(x, "nu_pos") - prog.extract(x, "nu_neg")
        return jnp.sum(jnp.abs(nu))
    return prog.extract(x, "norm1_nu")


@partial(jax.jit, static_argnums=(0, 2))
def solve_scvx(model, params, cfg: SCvxConfig = SCvxConfig(),
               warm_td: TrajectoryData = None) -> SCvxResult:
    """Full SCvx solve as one jitted function (SCvxAlgorithm.cpp:166-222).

    ``warm_td`` (dimensional) replaces the model's initial trajectory,
    mirroring solve(warm_start=true).
    """
    if cfg.nondimensionalize:
        params = model.nondimensionalize(params)
    par = model.param_vector(params)

    if warm_td is None:
        td0 = model.init_trajectory(params, cfg.K, cfg.interpolate_input)
    else:
        td0 = (model.scale_trajectory(params, warm_td)
               if cfg.nondimensionalize else warm_td)

    # constraint linearization refs refresh once per solve (see module doc)
    ref = model.constraint_ref(params, td0)

    dtype = td0.X.dtype
    w_nu = jnp.asarray(cfg.weight_virtual_control, dtype)

    if cfg.fuse_dynamics:
        from scpp_tpu.ops.disc_mono import (multiple_shooting_fused,
                                            nonlinear_defect_cost_fused)

    def step(i, carry):
        (td, trust, last_J, has_last, accepts, converged, done, max_res,
         first_fail, warm, has_warm) = carry

        if cfg.fuse_dynamics:
            dd = multiple_shooting_fused(model, par, td,
                                         substeps=cfg.substeps,
                                         method=cfg.integrator)
        else:
            dd = multiple_shooting(model, par, td, substeps=cfg.substeps,
                                   method=cfg.integrator,
                                   variable_time=False)
        # the state radius rides the same accept/reject ladder as the input
        # radius, scaled by the configured ratio
        x_trust = (jnp.asarray(trust, dtype) *
                   (cfg.state_trust_region / cfg.trust_region)
                   if cfg.state_trust_region else None)
        if cfg.backend == "staged":
            if not cfg.l1_split:
                raise ValueError("backend='staged' requires l1_split=True "
                                 "(the norm1_nu epigraph is not stage-local)")
            prog = build_scvx_subproblem_staged(
                model, params, td, dd, jnp.asarray(trust, dtype), w_nu, ref,
                x_trust)
            # consecutive subproblems differ only in data — warm-start the
            # IPM from the previous solve's primal/dual state (no ECOS
            # analog: the reference cold-starts every solve,
            # SCAlgorithm.cpp:78)
            res = solve_staged_ipm(prog, cfg.solver,
                                   warm if cfg.warm_start else None,
                                   has_warm)
        else:
            prog = build_scvx_subproblem(model, params, td, dd,
                                         jnp.asarray(trust, dtype), w_nu, ref,
                                         cfg.l1_split, x_trust)
            res = solve(prog, cfg.solver)

        new_td = td.replace(X=prog.extract(res.x, "X"),
                            U=prog.extract(res.x, "U"))
        # L from the linear defect of the returned iterate, not norm1_nu —
        # identical at an exact optimum, robust under inexact conic solves
        # (see linear_defect_cost)
        L = linear_defect_cost(new_td, dd)
        if cfg.fuse_dynamics:
            J_new = nonlinear_defect_cost_fused(
                model, par, new_td, cfg.sim_substeps, cfg.integrator)
        else:
            J_new = nonlinear_defect_cost(model, par, new_td,
                                          cfg.sim_substeps,
                                          cfg.integrator)

        # per-scenario failure masking (SURVEY §5): a failed subproblem
        # solve must not poison the carried trajectory — treat the step as
        # rejected instead of std::terminate'ing like the reference
        # (SCvxAlgorithm.cpp:87-91). Two failure modes:
        #   (a) non-finite solution / costs;
        #   (b) the returned iterate is *worse in the linear model* than
        #       the incumbent: the previous td is always feasible for the
        #       subproblem (nu absorbs its own linear defect, so its cost
        #       is ~last_J), hence a true optimum satisfies L <= last_J up
        #       to integration mismatch. L > last_J means the conic solver
        #       exhausted its budget with a large duality gap — with ECOS
        #       this state is unreachable (it polishes to optimality or
        #       errors out), but a fixed-budget IPM can land here, and the
        #       ratio test would *accept* it (actual ~ predicted, both
        #       negative, rho ~ 1) and grow the radius into runaway.
        actual = last_J - J_new
        predicted = last_J - L
        first = jnp.logical_not(has_last)
        finite_ok = (jnp.all(jnp.isfinite(new_td.X))
                     & jnp.all(jnp.isfinite(new_td.U))
                     & jnp.isfinite(J_new) & jnp.isfinite(L))
        solve_ok = jnp.logical_or(first, predicted > -cfg.change_threshold)
        step_ok = finite_ok & solve_ok

        # ratio test (SCvxAlgorithm.cpp:95-154)
        conv_now = jnp.logical_and(jnp.logical_not(first),
                                   jnp.abs(predicted) < cfg.change_threshold)
        rho = actual / jnp.where(jnp.abs(predicted) < 1e-30,
                                 jnp.asarray(1e-30, dtype), predicted)
        reject = jnp.logical_and(jnp.logical_not(first),
                                 jnp.logical_and(jnp.logical_not(conv_now),
                                                 rho < cfg.rho_0))
        reject = jnp.logical_or(reject, jnp.logical_not(step_ok))
        conv_now = jnp.logical_and(conv_now, step_ok)
        accept = jnp.logical_not(reject)

        shrink = jnp.logical_or(reject, jnp.logical_and(accept, rho < cfg.rho_1))
        grow = jnp.logical_and(accept, rho >= cfg.rho_2)
        trust_new = jnp.where(jnp.logical_or(first, conv_now), trust,
                              jnp.where(shrink, trust / cfg.alpha,
                                        jnp.where(grow, trust * cfg.beta, trust)))

        td_next = tree_select(jnp.logical_and(accept, jnp.logical_not(done)),
                              new_td, td)
        # reference quirk: last_J overwritten even on reject (cpp:118) —
        # except on masked failures, where the old value must survive
        last_J_next = jnp.where(done | jnp.logical_not(step_ok),
                                last_J, J_new)
        accepts_next = accepts + jnp.where(
            jnp.logical_and(accept, jnp.logical_not(done)), 1, 0)
        converged_next = jnp.logical_or(converged,
                                        jnp.logical_and(conv_now,
                                                        jnp.logical_not(done)))
        done_next = jnp.logical_or(
            done, jnp.logical_or(converged_next,
                                 accepts_next >= cfg.max_iterations))
        trust_next = jnp.where(done, trust, trust_new)
        # worst *finite* feasibility residual; non-finite values must not
        # poison the running max (gap-induced suboptimality is handled by
        # the solve_ok guard above, not folded in here)
        step_res = jnp.maximum(res.res_pri, res.res_dua)
        max_res_next = jnp.where(
            done | jnp.logical_not(jnp.isfinite(step_res)), max_res,
            jnp.maximum(max_res, step_res))
        first_fail_next = jnp.where(
            (first_fail < 0) & jnp.logical_not(done)
            & jnp.logical_not(step_ok), i, first_fail)

        # carry the solver state as next step's warm start, gated on
        # solve health: a non-finite iterate must not poison future inits
        if cfg.backend == "staged" and cfg.warm_start:
            warm_good = finite_ok & jnp.all(
                jnp.isfinite(jnp.stack([res.res_pri, res.res_dua])))
            warm_next = jax.tree_util.tree_map(
                lambda n, o: jnp.where(warm_good & jnp.logical_not(done),
                                       n, o), res, warm)
            has_warm_next = has_warm | (warm_good & jnp.logical_not(done))
        else:
            warm_next, has_warm_next = warm, has_warm

        out = (td_next.X, td_next.U,
               jnp.logical_and(accept, jnp.logical_not(done)),
               J_new, L, res.res_pri, res.res_dua)
        return (td_next, trust_next, last_J_next, jnp.asarray(True),
                accepts_next, converged_next, done_next, max_res_next,
                first_fail_next, warm_next, has_warm_next), out

    if cfg.backend == "staged" and cfg.warm_start:
        # a zero StagedSolverResult with the subproblem's (static) shapes
        # as the initial warm carry; has_warm=False makes step 0 cold.
        # Building the step-0 program here costs nothing extra: XLA CSEs
        # it with the identical build inside the first loop iteration.
        dd0 = multiple_shooting(model, par, td0, substeps=cfg.substeps,
                                method=cfg.integrator, variable_time=False)
        prog0 = build_scvx_subproblem_staged(
            model, params, td0, dd0, jnp.asarray(cfg.trust_region, dtype),
            w_nu, ref,
            (jnp.asarray(cfg.state_trust_region, dtype)
             if cfg.state_trust_region else None))
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

    carry0 = (td0, jnp.asarray(cfg.trust_region, dtype),
              jnp.asarray(0.0, dtype), jnp.asarray(False),
              jnp.asarray(0, jnp.int32),
              jnp.asarray(False), jnp.asarray(False), jnp.asarray(0.0, dtype),
              jnp.asarray(-1, jnp.int32), warm0, jnp.asarray(False))

    # early-exit while_loop instead of a fixed-trip scan over the budget:
    # converged solves stop iterating (under vmap the batching rule keeps
    # stepping only while some scenario is active, with done scenarios'
    # carries select-frozen — identical carried results to the scan).
    # Per-step history is written into preallocated buffers carried through
    # the loop; slots past the exit step are back-filled below.
    budget = cfg.solve_budget
    hist0 = (jnp.zeros((budget,) + td0.X.shape, dtype),
             jnp.zeros((budget,) + td0.U.shape, dtype),
             jnp.zeros((budget,), bool),
             jnp.zeros((budget,), dtype),
             jnp.zeros((budget,), dtype),
             jnp.zeros((budget,), dtype),
             jnp.zeros((budget,), dtype))

    def w_cond(state):
        i, carry, _ = state
        done = carry[6]
        return (i < budget) & jnp.logical_not(done)

    def w_body(state):
        i, carry, hist = state
        carry, out = step(i, carry)
        hist = tuple(h.at[i].set(o) for h, o in zip(hist, out))
        return (i + 1, carry, hist)

    n_steps, (td, trust, _, _, accepts, converged, _, max_res, first_fail,
              _, _), ys = jax.lax.while_loop(
        w_cond, w_body, (jnp.asarray(0, jnp.int32), carry0, hist0))

    # back-fill trailing history slots (steps never executed after early
    # exit) with the last executed step's values, so e.g. J[-1] is the
    # final cost rather than 0
    idx = jnp.minimum(jnp.arange(budget), jnp.maximum(n_steps - 1, 0))
    all_X, all_U, accepted, Js, Ls, rps, rds = (h[idx] for h in ys)
    # ...except `accepted`, where a phantom repeat would miscount
    accepted = jnp.where(jnp.arange(budget) < n_steps, accepted, False)

    if cfg.nondimensionalize:
        td = model.unscale_trajectory(params, td)

    return SCvxResult(
        td=td, converged=converged, iterations=accepts, trust_region=trust,
        all_X=all_X, all_U=all_U, accepted=accepted,
        nonlinear_cost=Js, linear_cost=Ls, res_pri=rps, res_dua=rds,
        steps=n_steps, max_residual=max_res, first_failure=first_fail,
    )
