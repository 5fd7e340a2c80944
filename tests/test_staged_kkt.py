"""Quasidefinite block-tridiagonal / arrow factorization vs dense oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpp_tpu.solver.staged_kkt import (
    arrow_factor, arrow_solve, signed_block_tridiag_factor,
    signed_block_tridiag_solve, signed_cholesky,
)


@pytest.fixture(autouse=True)
def _full_precision():
    # the kernels defer matmul precision to the ambient context
    # (solve_staged_ipm normally sets it); direct calls here must pin full
    # precision to stay tolerance-robust if run on a TPU backend
    with jax.default_matmul_precision("highest"):
        yield


def _quasidefinite_blocks(rng, K, p, q, g=0, p_glob=0):
    """Random quasidefinite block-tridiagonal (+ optional arrow border).

    Built as the KKT matrix [[H + I, A'], [A, -I]] of a random banded
    least-squares problem, which is exactly the structure the IPM emits.
    """
    w = p + q
    n = K * p
    # H: SPD block-tridiagonal over the primal columns
    Gb = rng.standard_normal((K, 3 * p, 2 * p)) * 0.7
    Gb[-1, :, p:] = 0.0
    # A: banded equality rows (q per stage, touching stages k, k+1)
    Ab = rng.standard_normal((K, q, 2 * p)) * 0.8
    Ab[-1, :, p:] = 0.0

    dense = np.zeros((K * w + g, K * w + g))

    def xi(k):
        return slice(k * w, k * w + p)

    def yi(k):
        return slice(k * w + p, (k + 1) * w)

    for k in range(K):
        Hloc = Gb[k].T @ Gb[k]
        dense[xi(k), xi(k)] += Hloc[:p, :p] + np.eye(p)
        if k + 1 < K:
            dense[xi(k + 1), xi(k + 1)] += Hloc[p:, p:]
            dense[xi(k + 1), xi(k)] += Hloc[p:, :p]
            dense[xi(k), xi(k + 1)] += Hloc[:p, p:]
        dense[yi(k), xi(k)] += Ab[k][:, :p]
        dense[xi(k), yi(k)] += Ab[k][:, :p].T
        if k + 1 < K:
            dense[yi(k), xi(k + 1)] += Ab[k][:, p:]
            dense[xi(k + 1), yi(k)] += Ab[k][:, p:].T
        dense[yi(k), yi(k)] = -np.eye(q)

    if g:
        Bg = rng.standard_normal((K, w, g)) * 0.5
        for k in range(K):
            dense[k * w:(k + 1) * w, K * w:] = Bg[k]
            dense[K * w:, k * w:(k + 1) * w] = Bg[k].T
        Cg_p = rng.standard_normal((p_glob, p_glob))
        Cg = np.zeros((g, g))
        Cg[:p_glob, :p_glob] = Cg_p @ Cg_p.T + (1.0 + 2.0 * K) * np.eye(p_glob)
        Cg[p_glob:, p_glob:] = -(1.0 + 2.0 * K) * np.eye(g - p_glob)
        dense[K * w:, K * w:] = Cg
    else:
        Bg = Cg = None

    D = np.stack([dense[k * w:(k + 1) * w, k * w:(k + 1) * w]
                  for k in range(K)])
    O = np.stack([dense[(k + 1) * w:(k + 2) * w, k * w:(k + 1) * w]
                  for k in range(K - 1)])
    return dense, D, O, Bg, Cg


def test_signed_cholesky_reconstructs():
    rng = np.random.default_rng(0)
    p, q = 5, 3
    w = p + q
    P = rng.standard_normal((p, p))
    P = P @ P.T + np.eye(p)
    N = rng.standard_normal((q, q))
    N = N @ N.T + np.eye(q)
    B = rng.standard_normal((q, p))
    M = np.block([[P, B.T], [B, -N]])
    L = np.asarray(signed_cholesky(jnp.asarray(M), p))
    S = np.diag([1.0] * p + [-1.0] * q)
    np.testing.assert_allclose(L @ S @ L.T, M, atol=1e-10)
    assert np.allclose(np.triu(L, 1), 0.0)


@pytest.mark.parametrize("K,p,q", [(4, 3, 2), (8, 6, 3), (12, 5, 5)])
def test_block_tridiag_solve_matches_dense(K, p, q):
    rng = np.random.default_rng(K * 100 + p)
    dense, D, O, _, _ = _quasidefinite_blocks(rng, K, p, q)
    w = p + q
    b = rng.standard_normal((K, w))
    L_diag, C_sub = signed_block_tridiag_factor(
        jnp.asarray(D), jnp.asarray(O), p)
    x = np.asarray(signed_block_tridiag_solve(L_diag, C_sub, p,
                                              jnp.asarray(b)))
    x_ref = np.linalg.solve(dense, b.ravel()).reshape(K, w)
    np.testing.assert_allclose(x, x_ref, atol=1e-8)


def test_block_tridiag_multi_rhs():
    rng = np.random.default_rng(7)
    K, p, q, r = 6, 4, 2, 5
    dense, D, O, _, _ = _quasidefinite_blocks(rng, K, p, q)
    w = p + q
    b = rng.standard_normal((K, w, r))
    L_diag, C_sub = signed_block_tridiag_factor(
        jnp.asarray(D), jnp.asarray(O), p)
    x = np.asarray(signed_block_tridiag_solve(L_diag, C_sub, p,
                                              jnp.asarray(b)))
    x_ref = np.linalg.solve(dense, b.reshape(K * w, r)).reshape(K, w, r)
    np.testing.assert_allclose(x, x_ref, atol=1e-8)


@pytest.mark.parametrize("g,p_glob", [(1, 1), (3, 2), (4, 2)])
def test_arrow_solve_matches_dense(g, p_glob):
    rng = np.random.default_rng(g * 13 + p_glob)
    K, p, q = 7, 4, 3
    dense, D, O, Bg, Cg = _quasidefinite_blocks(rng, K, p, q, g, p_glob)
    w = p + q
    b = rng.standard_normal(K * w + g)
    fact = arrow_factor(jnp.asarray(D), jnp.asarray(O), jnp.asarray(Bg),
                        jnp.asarray(Cg), p, p_glob)
    xs, xg = arrow_solve(fact, jnp.asarray(b[:K * w].reshape(K, w)),
                         jnp.asarray(b[K * w:]))
    x_ref = np.linalg.solve(dense, b)
    np.testing.assert_allclose(np.asarray(xs).ravel(), x_ref[:K * w],
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(xg), x_ref[K * w:], atol=1e-7)
