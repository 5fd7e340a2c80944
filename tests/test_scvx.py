"""End-to-end SCvx on Rocket2D (SURVEY §7 step 4 acceptance): convergence,
dynamic feasibility, constraint satisfaction, batching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpp_tpu.algos.common import interval_resimulation
from scpp_tpu.algos.scvx import solve_scvx
from scpp_tpu.configs.algorithms import SCvxConfig
from scpp_tpu.models import Rocket2D
from scpp_tpu.solver.ipm import IPMSettings


@pytest.fixture(scope="module")
def scvx_result():
    # final_time=16 s is dynamically reachable (the stock 12 s is not at
    # fixed final time; SC's free sigma handles that case instead).
    # l1_split=False exercises the reference-faithful epigraph encoding;
    # the split encoding is covered by test_l1_encodings_agree.
    # state_trust_region keeps late iterations from re-wandering in X so
    # the deep 1e-6 convergence threshold is reached deterministically
    # (without it, whether the budget suffices depends on ulp-level branch
    # flips between compilations); the input-only parity path is covered
    # by test_scvx_infeasible_final_time_yields_virtual_control.
    cfg = SCvxConfig(K=20, max_iterations=25, solve_budget=35,
                     nondimensionalize=True, change_threshold=1e-6,
                     l1_split=False, backend="dense",
                     state_trust_region=5.0)
    p = Rocket2D.default_params()
    p = p.replace(final_time=jnp.asarray(16.0))
    res = solve_scvx(Rocket2D, p, cfg)
    return cfg, p, res


def test_l1_encodings_agree():
    """The nu+/nu- split and the reference epigraph L1 encodings solve the
    same convex subproblem: optimal objective values agree. (Full SCvx
    trajectories may differ — the L1 optimum is degenerate and each
    encoding's interior point selects a different optimal face.)"""
    from scpp_tpu.algos.scvx import build_scvx_subproblem, extract_norm1_nu
    from scpp_tpu.ops.discretization import multiple_shooting
    from scpp_tpu.solver import solve
    from scpp_tpu.solver.ipm import IPMSettings

    p = Rocket2D.nondimensionalize(Rocket2D.default_params())
    par = Rocket2D.param_vector(p)
    td = Rocket2D.init_trajectory(p, 15, True)
    dd = multiple_shooting(Rocket2D, par, td, substeps=8,
                           variable_time=False)
    objs = {}
    for split in (False, True):
        prog = build_scvx_subproblem(Rocket2D, p, td, dd,
                                     jnp.asarray(5.0), jnp.asarray(1e3), (),
                                     split)
        res = solve(prog, IPMSettings(iters=30))
        objs[split] = (float(res.obj),
                       float(extract_norm1_nu(prog, res.x, split)))
    np.testing.assert_allclose(objs[True][0], objs[False][0], rtol=1e-6)
    np.testing.assert_allclose(objs[True][1], objs[False][1],
                               rtol=1e-5, atol=1e-9)


def test_scvx_converges(scvx_result):
    cfg, p, res = scvx_result
    assert bool(res.converged)
    assert float(res.max_residual) < 1e-8
    J = np.asarray(res.nonlinear_cost)
    assert J[-1] < 1e-5, f"final nonlinear cost {J[-1]}"


def test_scvx_trajectory_dynamically_feasible(scvx_result):
    """Converged trajectory satisfies the *nonlinear* dynamics: resimulated
    interval defects are tiny in dimensional units (defect analog of
    SCAlgorithm.cpp:234-253)."""
    cfg, p, res = scvx_result
    par = Rocket2D.param_vector(p)
    x_end = interval_resimulation(Rocket2D, par, res.td, substeps=16)
    defects = np.max(np.abs(np.asarray(x_end - res.td.X[1:])), axis=1)
    assert np.max(defects) < 1e-3, f"defects {defects}"


def test_scvx_boundary_and_path_constraints(scvx_result):
    cfg, p, res = scvx_result
    X = np.asarray(res.td.X)
    U = np.asarray(res.td.U)
    tol = 1e-5
    np.testing.assert_allclose(X[0], np.asarray(p.x_init), atol=tol)
    np.testing.assert_allclose(X[-1], np.asarray(p.x_final), atol=tol)
    assert np.all(U[:, 1] >= float(p.T_min) - 1.0)
    assert np.all(U[:, 1] <= float(p.T_max) + 1.0)
    assert np.all(np.abs(U[:, 0]) <= float(p.gimbal_max) + tol)
    assert np.all(np.abs(X[:, 4]) <= float(p.theta_max) + tol)
    assert np.all(np.abs(X[:, 5]) <= float(p.w_B_max) + tol)
    assert np.all(np.abs(X[:, 0]) <= np.tan(float(p.gamma_gs)) * X[:, 1] + 1e-3)
    assert abs(U[-1, 0]) < tol


def test_scvx_infeasible_final_time_yields_virtual_control():
    """At the stock (infeasible) 12 s fixed final time, SCvx converges to a
    nonzero stationary virtual control that measures the infeasibility —
    no crash, no divergence (per-scenario robustness, SURVEY §5)."""
    cfg = SCvxConfig(K=12, max_iterations=12, solve_budget=16,
                     nondimensionalize=True)
    p = Rocket2D.default_params()
    res = solve_scvx(Rocket2D, p, cfg)
    J = np.asarray(res.nonlinear_cost)
    assert np.all(np.isfinite(J))
    assert J[-1] < J[0]
    assert float(res.max_residual) < 1e-6


def test_scvx_vmapped_scenarios():
    """Batched solves over dispersed initial states stay independent.

    Within one compiled program, duplicated scenarios must be bitwise
    identical (no cross-scenario coupling in the batched solver). Across
    programs (batched vs single) only loose agreement is asserted: ulp-level
    fusion differences between the two compilations flip accept/reject
    branches in the ratio test (see the fixture note above), so bitwise
    cross-program equality is not a property the algorithm has.
    """
    cfg = SCvxConfig(K=10, max_iterations=6, solve_budget=8,
                     nondimensionalize=True,
                     solver=IPMSettings(iters=20))
    p = Rocket2D.default_params()
    offsets = jnp.asarray([0.0, 10.0, -15.0, 10.0])

    def one(dx):
        pp = p.replace(x_init=p.x_init.at[0].add(dx),
                       final_time=jnp.asarray(16.0))
        return solve_scvx(Rocket2D, pp, cfg).td.X

    batched = jax.vmap(one)(offsets)
    # independence: scenarios 1 and 3 are identical inputs
    np.testing.assert_array_equal(np.asarray(batched[1]),
                                  np.asarray(batched[3]))
    # cross-program: trajectories agree to well under the 1e-3 parity target
    single = one(offsets[1])
    np.testing.assert_allclose(np.asarray(batched[1]), np.asarray(single),
                               rtol=1e-3, atol=1e-4)


def test_scvx_state_trust_region_rocketquat():
    """Input-only trust regions (reference parity) let the subproblem move
    X far from the linearization point on RocketQuat — ||nu||_1 goes to 0
    while the resimulated defect stays O(1) and SCvx never converges. The
    optional state trust region (SCvxConfig.state_trust_region) restores
    the original-SCvx convergence: J and L meet at the minimum-virtual-
    control fixed point of the (infeasible) fixed-final-time problem."""
    from scpp_tpu.models import RocketQuat
    cfg = SCvxConfig(K=15, max_iterations=25, solve_budget=35,
                     change_threshold=1e-3, nondimensionalize=True,
                     substeps=6, sim_substeps=8, state_trust_region=5.0,
                     solver=IPMSettings(iters=25, eps_reg=1e-8,
                                        eps_feas=1e-7))
    p = RocketQuat.default_params()
    res = solve_scvx(RocketQuat, p, cfg)
    assert bool(res.converged)
    assert int(res.iterations) <= 15
    assert float(res.max_residual) < 1e-3
    J = np.asarray(res.nonlinear_cost)
    L = np.asarray(res.linear_cost)
    # converged to the L1-penalized fixed point: J tracks L closely
    assert abs(J[-1] - L[-1]) < 2e-2
    assert J[-1] < 0.25 * J[0]
