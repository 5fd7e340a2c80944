"""Staged IPM vs the dense IPM oracle on stage-structured SOCPs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpp_tpu.solver.affine import Aff
from scpp_tpu.solver.ipm import IPMSettings, solve_conic_ipm
from scpp_tpu.solver.ipm_staged import solve_staged_ipm
from scpp_tpu.solver.staged import StagedBuilder


def _toy_tracking_program(K=6, n=3, m=2, free_time=False, seed=0,
                          mask_boundary=True):
    """A miniature SCvx-like subproblem: linear dynamics chain + virtual
    control + per-node trust regions + boundary pins (+ optional global
    sigma column and trust region)."""
    rng = np.random.default_rng(seed)
    A_k = jnp.asarray(np.eye(n)[None] + 0.1 * rng.standard_normal((K - 1, n, n)))
    B_k = jnp.asarray(0.3 * rng.standard_normal((K - 1, n, m)))
    z_k = jnp.asarray(0.05 * rng.standard_normal((K - 1, n)))
    s_k = jnp.asarray(0.1 * rng.standard_normal((K - 1, n)))
    x_init = jnp.asarray(rng.standard_normal(n))
    x_ref = jnp.asarray(rng.standard_normal((K, n)) * 0.5)
    u_ref = jnp.asarray(rng.standard_normal((K, m)) * 0.5)

    sb = StagedBuilder(K)
    x = sb.stage_var("x", n)
    u = sb.stage_var("u", m)
    nup = sb.stage_var("nup", n, n_nodes=K - 1)
    nun = sb.stage_var("nun", n, n_nodes=K - 1)

    dyn = (x.lin(A_k) + u.lin(B_k) - x.next.sel() + nup.sel() - nun.sel()
           + z_k)
    if free_time:
        sigma, sref = sb.global_var("sigma")
        dyn = dyn + sref.node_lin(s_k[:, :, None])
        sb.g_nonneg(sigma[...] - 0.1)
        sb.g_soc(Aff.constant(0.6), sigma[...] - 1.0)
        sb.g_cost(sigma[...] * 0.5)
    sb.eq(dyn)

    if mask_boundary:
        sb.eq(x.sel() - x_init, nodes=[0])
        sb.eq(x.sel([0, 1]) - np.asarray([0.2, -0.1]), nodes=[K - 1])

    sb.nonneg(nup.sel(), nodes=np.arange(K - 1))
    sb.nonneg(nun.sel(), nodes=np.arange(K - 1))
    sb.cost((nup.sel().sum() + nun.sel().sum()) * 10.0,
            nodes=np.arange(K - 1))

    # per-node trust regions around the reference
    sb.soc(1.5 + 0.0 * u.sel(0).sum(), u.sel() - u_ref)
    sb.soc(2.5 + 0.0 * x.sel(0).sum(), x.sel() - x_ref)
    # a static per-node inequality
    sb.nonneg(x.sel(n - 1) + 5.0)
    # quadratic-ish tracking cost via linear terms
    sb.cost(x.sel().sum() * 0.01 + u.sel(0) * 0.02)

    return sb.build(jnp.zeros(0).dtype)


@pytest.mark.parametrize("free_time", [False, True])
@pytest.mark.parametrize("seed", [0, 1])
def test_staged_matches_dense(free_time, seed):
    prog = _toy_tracking_program(free_time=free_time, seed=seed)
    dense = prog.to_dense()
    res_d = solve_conic_ipm(dense, IPMSettings(iters=30))
    res_s = solve_staged_ipm(prog, IPMSettings(iters=30))

    assert float(res_s.res_pri) < 1e-7
    assert float(res_s.res_dua) < 1e-7
    np.testing.assert_allclose(float(res_s.obj), float(res_d.obj),
                               rtol=1e-6, atol=1e-6)

    # both backends reach ~1e-7 KKT residuals, but solution-space agreement
    # is amplified by the subproblem conditioning — 2e-5 proved brittle
    # across machines (fused-op ulp differences flip the last IPM steps)
    K, w, g = prog.K, prog.w, prog.g
    x_dense = np.asarray(res_d.x[:K * w]).reshape(K, w)
    np.testing.assert_allclose(np.asarray(res_s.x_stage), x_dense,
                               atol=1e-4)
    if g:
        np.testing.assert_allclose(np.asarray(res_s.x_glob),
                                   np.asarray(res_d.x[K * w:]), atol=1e-4)


def test_extract_layout():
    prog = _toy_tracking_program(K=5)
    res = solve_staged_ipm(prog, IPMSettings(iters=25))
    X = prog.extract(res.x, "x")
    U = prog.extract(res.x, "u")
    nup = prog.extract(res.x, "nup")
    assert X.shape == (5, 3)
    assert U.shape == (5, 2)
    assert nup.shape == (4, 3)
    # boundary pin respected
    np.testing.assert_allclose(np.asarray(X[-1, :2]), [0.2, -0.1], atol=1e-6)


def test_no_equalities_at_all():
    """Pure conic projection (no eq rows anywhere)."""
    K, n = 4, 3
    p_ref = np.arange(K * n, dtype=float).reshape(K, n) / 6.0 - 1.0
    sb = StagedBuilder(K)
    x = sb.stage_var("x", n)
    t = sb.stage_var("t", 1)
    sb.soc(t.sel(0), x.sel() - jnp.asarray(p_ref))
    sb.nonneg(x.sel())
    sb.cost(t.sel(0))
    prog = sb.build()
    res = solve_staged_ipm(prog, IPMSettings(iters=25))
    X = np.asarray(prog.extract(res.x, "x"))
    np.testing.assert_allclose(X, np.maximum(p_ref, 0.0), atol=1e-6)


def test_kkt_dtype_f64_without_refine():
    """kkt_dtype='float64' alone must not crash the while_loop carry
    type check (advisor r04: the f64 factor's corrections promoted the
    iterates mid-carry); it now implies f64 compute and converges."""
    prog = _toy_tracking_program(K=5)
    prog32 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32)
        if hasattr(a, "astype") else a, prog)
    res = solve_staged_ipm(
        prog32, IPMSettings(iters=25, kkt_dtype="float64"))
    assert float(res.res_pri) < 1e-5
    assert float(res.res_gap) < 1e-5
