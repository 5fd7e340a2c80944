"""Staged (block-tridiagonal KKT) backend vs the dense oracle backend.

The staged path must produce the same SC/SCvx results as the dense
emission + dense-KKT IPM — same subproblems, different linear algebra
(solver/ipm_staged.py vs solver/ipm.py).
"""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpp_tpu.algos.sc import solve_sc
from scpp_tpu.algos.scvx import solve_scvx
from scpp_tpu.configs.algorithms import SCConfig, SCvxConfig
from scpp_tpu.models import Rocket2D, RocketQuat


@pytest.fixture(scope="module")
def r2d_params():
    return Rocket2D.default_params()


def _assert_controls_close(Ua, Ub, tol=1e-3):
    """1e-3 relative to each control component's magnitude: U columns are
    dimensional and wildly mixed-scale (gimbal ~0.3 rad, thrust ~4e5 N),
    so a flat rtol+atol pair either fails on the angle or tolerates ~400 N
    on the thrust. Normalizing per component keeps the intended relative
    contract with no absolute escape hatch."""
    Ua, Ub = np.asarray(Ua), np.asarray(Ub)
    scale = np.maximum(np.max(np.abs(Ub), axis=0), 1e-9)
    np.testing.assert_allclose(Ua / scale, Ub / scale, atol=tol, rtol=0)


def test_scvx_staged_matches_dense_rocket2d(r2d_params):
    cfg_d = SCvxConfig(K=8, solve_budget=14, max_iterations=12,
                       substeps=4, sim_substeps=5, backend="dense")
    cfg_s = replace(cfg_d, backend="staged")
    rd = solve_scvx(Rocket2D, r2d_params, cfg_d)
    rs = solve_scvx(Rocket2D, r2d_params, cfg_s)
    assert bool(rs.converged) == bool(rd.converged)
    # controls of the final accepted iterate agree at the BASELINE.json
    # accuracy contract (1e-3 on controls). The backends solve equivalent
    # but differently-encoded subproblems (explicit-nu equality vs defect
    # epigraph), so at finite IPM tolerance the iterates differ at ~1e-4.
    _assert_controls_close(rs.td.U, rd.td.U)
    assert float(rs.max_residual) < 1e-7


def test_sc_staged_matches_dense_rocket2d(r2d_params):
    cfg_d = SCConfig(K=8, max_iterations=8, substeps=4, sim_substeps=5,
                     backend="dense")
    cfg_s = replace(cfg_d, backend="staged")
    rd = solve_sc(Rocket2D, r2d_params, cfg_d)
    rs = solve_sc(Rocket2D, r2d_params, cfg_s)
    _assert_controls_close(rs.td.U, rd.td.U)
    np.testing.assert_allclose(float(rs.td.t), float(rd.td.t), rtol=1e-4)
    assert float(rs.max_residual) < 1e-7


def test_sc_staged_zoh_matches_dense(r2d_params):
    """ZOH exercises the short-U stage layout (padded last-stage input)."""
    cfg_d = SCConfig(K=7, max_iterations=6, substeps=4, sim_substeps=5,
                     interpolate_input=False, backend="dense")
    cfg_s = replace(cfg_d, backend="staged")
    rd = solve_sc(Rocket2D, r2d_params, cfg_d)
    rs = solve_sc(Rocket2D, r2d_params, cfg_s)
    _assert_controls_close(rs.td.U, rd.td.U)


def test_scvx_staged_rocketquat_converges():
    """Flagship configuration on the staged backend (small-K smoke)."""
    cfg = SCvxConfig(K=10, solve_budget=25, max_iterations=18,
                     change_threshold=1e-3, nondimensionalize=True,
                     substeps=4, sim_substeps=5, state_trust_region=5.0,
                     backend="staged")
    res = solve_scvx(RocketQuat, RocketQuat.default_params(), cfg)
    assert bool(res.converged)
    assert float(res.max_residual) < 1e-6
    # landed: position within glideslope, thrust within bounds
    X, U = np.asarray(res.td.X), np.asarray(res.td.U)
    p = RocketQuat.default_params()
    T = np.linalg.norm(U[:, :3], axis=1)
    assert np.all(T <= float(p.T_max) * (1 + 1e-6))
    assert np.all(X[:, 0] >= float(p.x_final[0]) - 1e-6)


def test_staged_backend_vmaps(r2d_params):
    """Scenario batching over the staged path (the bench configuration)."""
    from scpp_tpu.parallel.scenarios import disperse_initial_state
    cfg = SCvxConfig(K=6, solve_budget=4, max_iterations=3, substeps=3,
                     sim_substeps=3, backend="staged")
    pb = disperse_initial_state(Rocket2D, r2d_params, jax.random.PRNGKey(1),
                                3, scale=3.0)
    res = jax.vmap(lambda p: solve_scvx(Rocket2D, p, cfg))(pb)
    assert res.td.X.shape[0] == 3
    assert bool(jnp.all(jnp.isfinite(res.td.U)))
    # batched result equals the per-scenario result
    one = solve_scvx(Rocket2D, jax.tree_util.tree_map(lambda a: a[0], pb),
                     cfg)
    np.testing.assert_allclose(np.asarray(res.td.U[0]), np.asarray(one.td.U),
                               atol=1e-8)
