"""Block-tridiagonal Cholesky vs dense reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpp_tpu.solver.banded import (
    block_tridiag_cholesky, block_tridiag_matvec, block_tridiag_solve,
)


def _random_spd_block_tridiag(K, w, seed=0):
    rng = np.random.default_rng(seed)
    O = rng.standard_normal((K - 1, w, w)) * 0.3
    D = np.stack([np.eye(w) * (w + 1.0)
                  + 0.5 * (lambda M: M + M.T)(rng.standard_normal((w, w)))
                  for _ in range(K)])
    return jnp.asarray(D), jnp.asarray(O)


def _dense(D, O):
    K, w, _ = D.shape
    H = np.zeros((K * w, K * w))
    for k in range(K):
        H[k * w:(k + 1) * w, k * w:(k + 1) * w] = D[k]
    for k in range(K - 1):
        H[(k + 1) * w:(k + 2) * w, k * w:(k + 1) * w] = O[k]
        H[k * w:(k + 1) * w, (k + 1) * w:(k + 2) * w] = O[k].T
    return H


@pytest.mark.parametrize("K,w", [(5, 4), (30, 8), (12, 16)])
def test_solve_matches_dense(K, w):
    D, O = _random_spd_block_tridiag(K, w)
    H = _dense(np.asarray(D), np.asarray(O))
    assert np.all(np.linalg.eigvalsh(H) > 0), "test matrix must be SPD"

    rng = np.random.default_rng(1)
    b = rng.standard_normal((K, w))
    L_diag, L_sub = block_tridiag_cholesky(D, O)
    x = block_tridiag_solve(L_diag, L_sub, jnp.asarray(b))
    x_ref = np.linalg.solve(H, b.ravel()).reshape(K, w)
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-9, atol=1e-10)


def test_matvec_roundtrip():
    D, O = _random_spd_block_tridiag(10, 6, seed=3)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((10, 6)))
    b = block_tridiag_matvec(D, O, x)
    L_diag, L_sub = block_tridiag_cholesky(D, O)
    x2 = block_tridiag_solve(L_diag, L_sub, b)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x),
                               rtol=1e-9, atol=1e-10)


def test_multiple_rhs_and_vmap():
    D, O = _random_spd_block_tridiag(8, 5, seed=4)
    rng = np.random.default_rng(5)
    B = jnp.asarray(rng.standard_normal((8, 5, 3)))
    L_diag, L_sub = block_tridiag_cholesky(D, O)
    X = block_tridiag_solve(L_diag, L_sub, B)
    assert X.shape == (8, 5, 3)
    for r in range(3):
        b = block_tridiag_matvec(D, O, X[..., r])
        np.testing.assert_allclose(np.asarray(b), np.asarray(B[..., r]),
                                   rtol=1e-8, atol=1e-9)

    # vmap over a batch of systems
    Ds = jnp.stack([D, D * 1.1])
    Os = jnp.stack([O, O * 0.9])
    bs = jnp.asarray(rng.standard_normal((2, 8, 5)))
    xs = jax.vmap(lambda d, o, b: block_tridiag_solve(
        *block_tridiag_cholesky(d, o), b))(Ds, Os, bs)
    assert xs.shape == (2, 8, 5)
    np.testing.assert_allclose(
        np.asarray(block_tridiag_matvec(Ds[1], Os[1], xs[1])),
        np.asarray(bs[1]), rtol=1e-8, atol=1e-9)
