"""Conic solver: analytic optima, scipy linprog cross-checks, KKT
certification on random SOCPs, infeasibility detection, vmap batching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linprog

from scpp_tpu.solver import (
    ConeProblemBuilder, SolverSettings, solve_conic,
)
from scpp_tpu.solver.scs import project_dual_cone


def _settings(iters=1500):
    return SolverSettings(iters=iters)


def test_trivial_lp_box():
    # min x0 + 2 x1  s.t. 1 <= x <= 3  -> x* = (1, 1)
    pb = ConeProblemBuilder()
    x = pb.add_variable("x", 2)
    pb.add_box(1.0, x[...], 3.0)
    pb.add_cost(np.array([1.0, 2.0]) @ x[...])
    prog = pb.build()
    res = solve_conic(prog, _settings())
    np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-5)
    np.testing.assert_allclose(res.obj, 3.0, atol=1e-5)
    assert bool(res.solved)


def test_equality_and_nonneg():
    # min -x0 - x1 s.t. x0 + x1 == 1, x >= 0 -> obj = -1
    pb = ConeProblemBuilder()
    x = pb.add_variable("x", 2)
    pb.add_eq(x[...].sum() - 1.0)
    pb.add_nonneg(x[...])
    pb.add_cost(np.array([-1.0, -1.0]) @ x[...])
    prog = pb.build()
    res = solve_conic(prog, _settings())
    np.testing.assert_allclose(res.obj, -1.0, atol=1e-5)
    np.testing.assert_allclose(np.sum(res.x), 1.0, atol=1e-5)


def test_soc_projection_problem():
    # min t s.t. ||x - p|| <= t  -> t* = 0, x* = p
    p = np.array([1.5, -2.0, 0.5])
    pb = ConeProblemBuilder()
    x = pb.add_variable("x", 3)
    t = pb.add_variable("t")
    pb.add_soc(t[...], x[...] - p)
    pb.add_cost(t[...])
    prog = pb.build()
    res = solve_conic(prog, _settings())
    np.testing.assert_allclose(res.x[:3], p, atol=1e-4)
    assert res.obj < 1e-4


def test_closest_point_in_halfspace_soc():
    # min ||x - p||  s.t. x >= 0   (p has negative entries) -> x* = max(p,0)
    p = np.array([1.0, -2.0, 3.0, -0.5])
    pb = ConeProblemBuilder()
    x = pb.add_variable("x", 4)
    t = pb.add_variable("t")
    pb.add_soc(t[...], x[...] - p)
    pb.add_nonneg(x[...])
    pb.add_cost(t[...])
    prog = pb.build()
    res = solve_conic(prog, _settings())
    np.testing.assert_allclose(prog.extract(res.x, "x"), np.maximum(p, 0.0),
                               atol=1e-4)
    np.testing.assert_allclose(res.obj, np.linalg.norm(np.minimum(p, 0.0)),
                               atol=1e-4)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_lp_matches_scipy(seed):
    rng = np.random.default_rng(seed)
    n, m_eq, m_in = 8, 3, 12
    Aeq = rng.standard_normal((m_eq, n))
    x_feas = rng.uniform(0.5, 1.5, n)
    beq = Aeq @ x_feas
    Ain = rng.standard_normal((m_in, n))
    bin_ = Ain @ x_feas + rng.uniform(0.1, 1.0, m_in)  # Ain x <= bin_
    cc = rng.standard_normal(n)

    ref = linprog(cc, A_ub=Ain, b_ub=bin_, A_eq=Aeq, b_eq=beq,
                  bounds=[(0, None)] * n, method="highs")
    assert ref.status == 0

    pb = ConeProblemBuilder()
    x = pb.add_variable("x", n)
    pb.add_eq(Aeq @ x[...] - beq)
    pb.add_nonneg(bin_ - Ain @ x[...])
    pb.add_nonneg(x[...])
    pb.add_cost(cc @ x[...])
    prog = pb.build()
    res = solve_conic(prog, _settings(3000))
    np.testing.assert_allclose(float(res.obj), ref.fun, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("seed", [0, 1])
def test_random_socp_kkt_certificate(seed):
    """Construct a random strictly-feasible SOCP; certify the returned
    primal/dual pair by KKT residuals (no external solver needed)."""
    rng = np.random.default_rng(seed)
    n = 10
    soc_sizes = [3, 4]
    n_eq, n_in = 2, 5
    m = n_eq + n_in + sum(soc_sizes)
    A = rng.standard_normal((m, n))

    # strictly feasible primal slack s0 in K and dual y0 in K*
    def interior(sizes, n_eq, n_in):
        parts = [np.zeros(n_eq), rng.uniform(0.5, 1.5, n_in)]
        for q in sizes:
            z = rng.standard_normal(q - 1)
            t = np.linalg.norm(z) + rng.uniform(0.5, 1.0)
            parts.append(np.concatenate([[t], z]))
        return np.concatenate(parts)

    s0 = interior(soc_sizes, n_eq, n_in)
    y0 = interior(soc_sizes, n_eq, n_in)
    y0[:n_eq] = rng.standard_normal(n_eq)  # eq duals free
    x0 = rng.standard_normal(n)
    b = A @ x0 + s0
    c = -A.T @ y0

    pb = ConeProblemBuilder()
    x = pb.add_variable("x", n)
    pb.add_eq(A[:n_eq] @ x[...] - b[:n_eq])
    pb.add_nonneg(b[n_eq:n_eq + n_in] - A[n_eq:n_eq + n_in] @ x[...])
    off = n_eq + n_in
    for q in soc_sizes:
        rows = A[off:off + q]
        rhs = b[off:off + q]
        pb.add_soc(rhs[0] - rows[0] @ x[...], rows[1:] @ x[...] - rhs[1:])
        off += q
    pb.add_cost(c @ x[...])
    prog = pb.build()

    res = solve_conic(prog, _settings(3000))
    assert float(res.res_pri) < 1e-5
    assert float(res.res_dua) < 1e-5
    assert float(res.res_gap) < 1e-5
    # s in K, y in K* (within tolerance): projection is identity
    s_proj = np.asarray(project_dual_cone(
        jnp.asarray(np.asarray(res.s)).at[:n_eq].set(0.0), prog))
    np.testing.assert_allclose(s_proj, np.asarray(res.s), atol=1e-4)


def test_infeasible_detection():
    # x >= 1 and x <= 0 simultaneously: primal infeasible
    pb = ConeProblemBuilder()
    x = pb.add_variable("x")
    pb.add_nonneg(x[...] - 1.0)
    pb.add_nonneg(-x[...])
    pb.add_cost(x[...])
    prog = pb.build()
    res = solve_conic(prog, _settings())
    # tau -> 0, kappa > 0 signals infeasibility in the HSD embedding
    assert float(res.tau) < 1e-3
    assert float(res.kappa) > 1e-6


def test_vmap_batched_solves():
    """The same program structure solves for a batch of targets at once."""
    p_batch = np.stack([np.array([1.0, -1.0]),
                        np.array([2.0, 0.5]),
                        np.array([-3.0, 4.0])])

    def solve_one(p):
        pb = ConeProblemBuilder()
        x = pb.add_variable("x", 2)
        t = pb.add_variable("t")
        pb.add_soc(t[...], x[...] - p)
        pb.add_nonneg(x[...])
        pb.add_cost(t[...])
        prog = pb.build()
        res = solve_conic(prog, _settings(800))
        return prog.extract(res.x, "x")

    xs = jax.jit(jax.vmap(solve_one))(jnp.asarray(p_batch))
    np.testing.assert_allclose(np.asarray(xs), np.maximum(p_batch, 0.0),
                               atol=2e-4)


def test_extract_layout():
    pb = ConeProblemBuilder()
    X = pb.add_variable("X", 3, 2)
    y = pb.add_variable("y")
    pb.add_eq(X[...] - np.arange(6.0))
    pb.add_eq(y[...] - 7.0)
    pb.add_cost(y[...])
    prog = pb.build()
    res = solve_conic(prog, _settings(500))
    np.testing.assert_allclose(prog.extract(res.x, "X"),
                               np.arange(6.0).reshape(3, 2), atol=1e-5)
    np.testing.assert_allclose(prog.extract(res.x, "y"), 7.0, atol=1e-5)
