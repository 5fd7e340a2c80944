"""mono_blocks (monolithic-kernel linear algebra) vs staged_kkt oracle.

The blocks are pure jnp, so numeric equivalence is checked directly on
CPU (no interpreter needed); the Pallas integration is covered by
test_ipm_mono.py and the TPU smoke suite.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpp_tpu.solver.mono_blocks import (
    chol8, cr_sizes, mono_cr_factor, mono_cr_solve, signed_chol_inv,
    tri_inv8,
)
from scpp_tpu.solver.staged_kkt import (
    cr_factor, cr_solve, signed_cholesky,
)


def _quasidef(rng, K, w, p, batch=None):
    """Random quasidefinite block-tridiagonal (D, O) with signature
    (+1 x p, -1 x (w-p)) per stage."""
    shape = (batch,) if batch else ()

    def spd(n, scale=1.0):
        A = rng.standard_normal(shape + (K, n, n))
        M = np.einsum("...ij,...kj->...ik", A, A) + \
            scale * np.eye(n)
        return M

    P = spd(p)
    N = spd(w - p, 0.5)
    B = 0.3 * rng.standard_normal(shape + (K, w - p, p))
    top = np.concatenate([P, np.swapaxes(B, -1, -2)], axis=-1)
    bot = np.concatenate([B, -N], axis=-1)
    D = np.concatenate([top, bot], axis=-2)
    O = 0.2 * rng.standard_normal(shape + (K - 1, w, w))
    return D, O


@pytest.mark.parametrize("seed", [0, 1])
def test_chol8_inv8(seed):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((17, 8, 8))
    P = jnp.asarray(np.einsum("nij,nkj->nik", A, A) + 3 * np.eye(8))
    L = chol8(P)
    np.testing.assert_allclose(
        np.asarray(L @ jnp.swapaxes(L, 1, 2)), np.asarray(P),
        rtol=1e-10, atol=1e-10)
    X = tri_inv8(L)
    np.testing.assert_allclose(
        np.asarray(L @ X), np.broadcast_to(np.eye(8), (17, 8, 8)),
        rtol=0, atol=1e-9)


@pytest.mark.parametrize("w,p", [(16, 8), (48, 32), (24, 16)])
def test_signed_chol_inv(w, p):
    rng = np.random.default_rng(2)
    D, _ = _quasidef(rng, 5, w, p)
    M = jnp.asarray(D)                                 # (5, w, w)
    L, Linv = signed_chol_inv(M, p)
    sig = np.concatenate([np.ones(p), -np.ones(w - p)])
    rec = np.asarray(L) * sig @ np.swapaxes(np.asarray(L), 1, 2)
    np.testing.assert_allclose(rec, np.asarray(M), rtol=1e-9, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(L @ Linv), np.broadcast_to(np.eye(w), (5, w, w)),
        rtol=0, atol=1e-8)
    # matches the oracle factor up to the (unique) signed factorization
    L_ref = signed_cholesky(M, p)
    np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref),
                               rtol=1e-7, atol=1e-7)


@pytest.mark.parametrize("K", [2, 3, 7, 16, 30])
def test_mono_cr_solve_matches_oracle(K):
    w, p, B = 16, 8, 3
    rng = np.random.default_rng(K)
    D, O = _quasidef(rng, K, w, p, batch=B)
    b = rng.standard_normal((B, K, w))

    fact = mono_cr_factor(jnp.asarray(D), jnp.asarray(O), p)
    x = np.asarray(mono_cr_solve(fact, jnp.asarray(b), p))

    for i in range(B):
        fact_ref = cr_factor(jnp.asarray(D[i]), jnp.asarray(O[i]), p)
        x_ref = np.asarray(cr_solve(fact_ref, jnp.asarray(b[i])))
        np.testing.assert_allclose(x[i], x_ref, rtol=1e-7, atol=1e-8)

    # and against a dense solve of the full block-tridiagonal system
    i = 0
    M = np.zeros((K * w, K * w))
    for k in range(K):
        M[k * w:(k + 1) * w, k * w:(k + 1) * w] = D[i, k]
        if k + 1 < K:
            M[(k + 1) * w:(k + 2) * w, k * w:(k + 1) * w] = O[i, k]
            M[k * w:(k + 1) * w, (k + 1) * w:(k + 2) * w] = O[i, k].T
    x_dense = np.linalg.solve(M, b[i].ravel()).reshape(K, w)
    np.testing.assert_allclose(x[i], x_dense, rtol=1e-6, atol=1e-7)


def test_cr_sizes_flagship():
    assert cr_sizes(30) == [(30, 15), (15, 7), (8, 4), (4, 2), (2, 1)]
    assert cr_sizes(2) == [(2, 1)]


def test_fp32_accuracy():
    """fp32 path keeps ~1e-5 relative accuracy on well-conditioned data
    (the kernel's working precision)."""
    K, w, p, B = 12, 48, 32, 2
    rng = np.random.default_rng(7)
    D, O = _quasidef(rng, K, w, p, batch=B)
    b = rng.standard_normal((B, K, w))
    f32 = jnp.float32
    fact = mono_cr_factor(jnp.asarray(D, f32), jnp.asarray(O, f32), p)
    x32 = np.asarray(mono_cr_solve(fact, jnp.asarray(b, f32), p))
    fact64 = mono_cr_factor(jnp.asarray(D), jnp.asarray(O), p)
    x64 = np.asarray(mono_cr_solve(fact64, jnp.asarray(b), p))
    err = np.abs(x32 - x64).max() / (np.abs(x64).max() + 1)
    assert err < 1e-4, err
