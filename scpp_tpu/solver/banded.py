"""Block-tridiagonal Cholesky for trajectory-structured KKT systems.

The normal-equations matrix of a multiple-shooting subproblem is
block-tridiagonal when variables are ordered stage-by-stage (the dynamics
couple only adjacent nodes; path constraints, trust regions, and the
nu+/nu- split are stage-local — SURVEY §5 "the only sequential-in-k
structure is inside the SOCP"). Factoring it stage-recursively costs
O(K w^3) instead of the dense O((K w)^3) — the speed-of-light KKT path for
the interior-point backend on TPU, where each stage op is a small batched
matmul/Cholesky that vmaps over scenarios.

This module provides the factorization and solves; wiring it into the IPM
(stage-structured constraint emission) is the planned next step (see
PARITY.md roadmap).

Layout: H is given by diagonal blocks D: (K, w, w) and sub-diagonal
blocks O: (K-1, w, w) with H[k, k-1] = O[k-1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

__all__ = ["block_tridiag_cholesky", "block_tridiag_solve",
           "block_tridiag_matvec"]

_P = jax.lax.Precision.HIGHEST


def block_tridiag_cholesky(D, O):
    """Factor the SPD block-tridiagonal H = L L' stagewise.

    Returns (L_diag: (K, w, w) lower-triangular, L_sub: (K-1, w, w)) with
    L[k, k] = L_diag[k], L[k, k-1] = L_sub[k-1].
    """
    L0 = jnp.linalg.cholesky(D[0])

    def step(L_prev, inputs):
        O_k, D_k = inputs
        # M_k = O_k L_prev^{-T}  (solve L_prev X^T = O_k^T)
        M_k = solve_triangular(L_prev, O_k.T, lower=True, trans=0).T
        S_k = D_k - M_k @ M_k.T
        L_k = jnp.linalg.cholesky(S_k)
        return L_k, (L_k, M_k)

    _, (L_rest, L_sub) = jax.lax.scan(step, L0, (O, D[1:]))
    L_diag = jnp.concatenate([L0[None], L_rest], axis=0)
    return L_diag, L_sub


def block_tridiag_solve(L_diag, L_sub, b):
    """Solve H x = b given the stage factorization; b: (K, w) or (K, w, r)."""
    squeeze = b.ndim == 2
    if squeeze:
        b = b[..., None]

    y0 = solve_triangular(L_diag[0], b[0], lower=True)

    def fwd(y_prev, inputs):
        L_k, M_k, b_k = inputs
        y_k = solve_triangular(L_k, b_k - M_k @ y_prev, lower=True)
        return y_k, y_k

    _, y_rest = jax.lax.scan(fwd, y0, (L_diag[1:], L_sub, b[1:]))
    y = jnp.concatenate([y0[None], y_rest], axis=0)

    xK = solve_triangular(L_diag[-1], y[-1], lower=True, trans=1)

    def bwd(x_next, inputs):
        L_k, M_next, y_k = inputs
        x_k = solve_triangular(L_k, y_k - M_next.T @ x_next, lower=True,
                               trans=1)
        return x_k, x_k

    _, x_rest = jax.lax.scan(
        bwd, xK,
        (L_diag[:-1][::-1], L_sub[::-1], y[:-1][::-1]))
    x = jnp.concatenate([x_rest[::-1], xK[None]], axis=0)
    return x[..., 0] if squeeze else x


def block_tridiag_matvec(D, O, x):
    """H @ x for checking: x (K, w)."""
    y = jnp.einsum("kij,kj->ki", D, x, precision=_P)
    y = y.at[1:].add(jnp.einsum("kij,kj->ki", O, x[:-1], precision=_P))
    y = y.at[:-1].add(jnp.einsum("kji,kj->ki", O, x[1:], precision=_P))
    return y
