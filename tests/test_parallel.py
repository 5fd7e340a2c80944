"""Scenario batching and mesh sharding on the 8-device virtual CPU mesh.

Distributed correctness criterion (SURVEY §4): sharded multi-chip results
must match single-device per-scenario results (per-scenario math has no
cross-scenario coupling).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpp_tpu.configs.algorithms import SCvxConfig
from scpp_tpu.models import Rocket2D
from scpp_tpu.parallel.scenarios import (
    batch_summary, disperse_initial_state, make_scenario_mesh, solve_batch,
)
from scpp_tpu.solver.ipm import IPMSettings


@pytest.fixture(scope="module")
def batch_setup():
    cfg = SCvxConfig(K=8, max_iterations=4, solve_budget=5,
                     nondimensionalize=True, solver=IPMSettings(iters=15))
    p = Rocket2D.default_params().replace(final_time=jnp.asarray(16.0))
    key = jax.random.PRNGKey(0)
    pb = disperse_initial_state(Rocket2D, p, key, 8, scale=5.0)
    return cfg, p, pb


def test_disperse_shapes(batch_setup):
    cfg, p, pb = batch_setup
    assert pb.x_init.shape == (8, 6)
    assert pb.x_final.shape == (8, 6)
    # only x_init varies
    np.testing.assert_allclose(np.asarray(pb.T_max),
                               np.full(8, float(p.T_max)))
    # dispersion varied the states
    assert np.std(np.asarray(pb.x_init)[:, 0]) > 0.1


def test_disperse_feasible(batch_setup):
    """Dispersed initial states must satisfy the hard state constraints —
    the initial node is pinned, so an infeasible x_init would make every
    subproblem of that scenario infeasible."""
    cfg, p, pb = batch_setup
    xi = np.asarray(pb.x_init)
    tan_gs = np.tan(float(p.gamma_gs))
    assert np.all(np.abs(xi[:, 0]) <= tan_gs * xi[:, 1] + 1e-12)
    assert np.all(np.abs(xi[:, 4]) <= float(p.theta_max))
    assert np.all(np.abs(xi[:, 5]) <= float(p.w_B_max))


def test_disperse_feasible_quat():
    from scpp_tpu.models import RocketQuat
    p = RocketQuat.default_params()
    pb = disperse_initial_state(RocketQuat, p, jax.random.PRNGKey(3), 16,
                                scale=20.0)
    xi = np.asarray(pb.x_init)
    # unit quaternions
    np.testing.assert_allclose(np.linalg.norm(xi[:, 7:11], axis=1), 1.0,
                               atol=1e-12)
    # glideslope, tilt, rate SOCs (rocketQuat.cpp:96-105)
    tan_gs = np.tan(float(p.gamma_gs))
    assert np.all(np.linalg.norm(xi[:, 1:3], axis=1) <= tan_gs * xi[:, 3])
    tilt = np.sqrt((1.0 - np.cos(float(p.theta_max))) / 2.0)
    assert np.all(np.linalg.norm(xi[:, 8:10], axis=1) <= tilt)
    assert np.all(np.linalg.norm(xi[:, 11:14], axis=1) <= float(p.w_B_max))


def test_vmap_batch_solve(batch_setup):
    cfg, p, pb = batch_setup
    res = solve_batch(Rocket2D, pb, cfg, "scvx")
    assert res.td.X.shape == (8, 8, 6)
    summary = batch_summary(res)
    assert summary["n"] == 8
    assert np.all(np.isfinite(np.asarray(res.td.X)))


def test_mesh_sharded_deterministic_and_equivalent(batch_setup):
    """The sharded program is bitwise deterministic across calls, and
    agrees with the unsharded batch on solution quality.

    Exact trajectory equality between differently-compiled programs is not
    guaranteed: the SCvx ratio test is a hard branch, so ulp-level fusion
    differences can flip an accept/reject and take a different (equally
    valid) iterate path. Determinism of each compiled program is the
    testable contract."""
    cfg, p, pb = batch_setup
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    mesh = make_scenario_mesh()
    res_a = solve_batch(Rocket2D, pb, cfg, "scvx", mesh=mesh)
    res_b = solve_batch(Rocket2D, pb, cfg, "scvx", mesh=mesh)
    np.testing.assert_array_equal(np.asarray(res_a.td.X),
                                  np.asarray(res_b.td.X))

    res_plain = solve_batch(Rocket2D, pb, cfg, "scvx")
    # same convergence behavior and same physical endpoints
    assert np.all(np.isfinite(np.asarray(res_a.td.X)))
    np.testing.assert_allclose(np.asarray(res_a.td.X[:, 0]),
                               np.asarray(res_plain.td.X[:, 0]),
                               atol=1e-5)  # pinned initial states (up to
    # per-program solver eq-residual noise)
    np.testing.assert_allclose(np.asarray(res_a.nonlinear_cost[:, -1]),
                               np.asarray(res_plain.nonlinear_cost[:, -1]),
                               rtol=1e-3, atol=0.5)
