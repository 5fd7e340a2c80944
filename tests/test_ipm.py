"""Interior-point backend: same oracle battery as the first-order solver,
at much tighter tolerances."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linprog

from scpp_tpu.solver import ConeProblemBuilder
from scpp_tpu.solver.ipm import IPMSettings, solve_conic_ipm


def test_box_lp_exact():
    pb = ConeProblemBuilder()
    x = pb.add_variable("x", 2)
    pb.add_box(1.0, x[...], 3.0)
    pb.add_cost(np.array([1.0, 2.0]) @ x[...])
    res = solve_conic_ipm(pb.build())
    np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-8)
    np.testing.assert_allclose(res.obj, 3.0, atol=1e-8)


def test_soc_projection_exact():
    p = np.array([1.0, -2.0, 3.0, -0.5])
    pb = ConeProblemBuilder()
    x = pb.add_variable("x", 4)
    t = pb.add_variable("t")
    pb.add_soc(t[...], x[...] - p)
    pb.add_nonneg(x[...])
    pb.add_cost(t[...])
    prog = pb.build()
    res = solve_conic_ipm(prog)
    np.testing.assert_allclose(prog.extract(res.x, "x"), np.maximum(p, 0.0),
                               atol=1e-7)
    np.testing.assert_allclose(res.obj, np.linalg.norm(np.minimum(p, 0.0)),
                               atol=1e-8)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_lp_matches_scipy(seed):
    rng = np.random.default_rng(seed)
    n, m_eq, m_in = 10, 4, 16
    Aeq = rng.standard_normal((m_eq, n))
    x_feas = rng.uniform(0.5, 1.5, n)
    beq = Aeq @ x_feas
    Ain = rng.standard_normal((m_in, n))
    bin_ = Ain @ x_feas + rng.uniform(0.1, 1.0, m_in)
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
    res = solve_conic_ipm(pb.build())
    np.testing.assert_allclose(float(res.obj), ref.fun, rtol=1e-7, atol=1e-7)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_socp_kkt(seed):
    rng = np.random.default_rng(seed)
    n = 12
    soc_sizes = [3, 5]
    n_eq, n_in = 3, 6
    m = n_eq + n_in + sum(soc_sizes)
    A = rng.standard_normal((m, n))

    def interior(sizes, n_eq, n_in):
        parts = [np.zeros(n_eq), rng.uniform(0.5, 1.5, n_in)]
        for q in sizes:
            z = rng.standard_normal(q - 1)
            parts.append(np.concatenate(
                [[np.linalg.norm(z) + rng.uniform(0.5, 1.0)], z]))
        return np.concatenate(parts)

    s0 = interior(soc_sizes, n_eq, n_in)
    y0 = interior(soc_sizes, n_eq, n_in)
    y0[:n_eq] = rng.standard_normal(n_eq)
    x0 = rng.standard_normal(n)
    b = A @ x0 + s0
    c = -A.T @ y0

    pb = ConeProblemBuilder()
    x = pb.add_variable("x", n)
    pb.add_eq(A[:n_eq] @ x[...] - b[:n_eq])
    pb.add_nonneg(b[n_eq:n_eq + n_in] - A[n_eq:n_eq + n_in] @ x[...])
    off = n_eq + n_in
    for q in soc_sizes:
        rows, rhs = A[off:off + q], b[off:off + q]
        pb.add_soc(rhs[0] - rows[0] @ x[...], rows[1:] @ x[...] - rhs[1:])
        off += q
    pb.add_cost(c @ x[...])
    res = solve_conic_ipm(pb.build())
    assert float(res.res_pri) < 1e-9
    assert float(res.res_dua) < 1e-9
    assert float(res.res_gap) < 1e-7


def test_iteration_overrun_is_safe():
    """Running far past convergence must not corrupt the solution (the
    boundary NT scaling freeze-guard)."""
    pb = ConeProblemBuilder()
    x = pb.add_variable("x", 2)
    pb.add_box(1.0, x[...], 3.0)
    pb.add_cost(np.array([1.0, 2.0]) @ x[...])
    res = solve_conic_ipm(pb.build(), IPMSettings(iters=60))
    np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-8)
    assert np.all(np.isfinite(np.asarray(res.x)))


def test_vmap_batch():
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
        return prog.extract(solve_conic_ipm(prog).x, "x")

    xs = jax.jit(jax.vmap(solve_one))(jnp.asarray(p_batch))
    np.testing.assert_allclose(np.asarray(xs), np.maximum(p_batch, 0.0),
                               atol=1e-5)
