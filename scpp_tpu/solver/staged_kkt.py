"""Quasidefinite block-tridiagonal + arrow KKT factorization.

The speed-of-light KKT path for trajectory SOCPs on TPU (SURVEY §2 V3,
§5 "banded structure, not communication"): with variables AND equality
multipliers ordered stage-by-stage, the regularized interior-point KKT
matrix

    M = [[H + eps I,  A'        ],      H = G' W^-2 G  (conic Gram)
         [A,          -delta I  ]]

is symmetric *quasidefinite* (Vanderbei 1995) and block-tridiagonal over
stages — dynamics rows couple only adjacent nodes (the reference's banded
dynamics chain, scpp_core/src/SCProblem.cpp:37-59), every other row is
stage-local.  A few global columns/rows (the free-final-time sigma, its
trust region) form an arrow border handled by a small Schur complement.

Quasidefinite matrices are *strongly factorizable*: every symmetric
permutation admits M = L S L' with L unit-free lower-triangular and
S = diag(+-1) whose signature is fixed by construction (+1 for primal
columns, -1 for multiplier columns).  Eliminating stage-by-stage keeps
every pivot block quasidefinite, so each stage factors with two small
Cholesky calls (primal part, then the negated dual Schur part) — batched
matmul/Cholesky ops that ride the MXU and vmap over scenarios, at
O(K w^3) total instead of the dense O((K w)^3).

Layout conventions:
  - D: (K, w, w) stage diagonal blocks, O: (K-1, w, w) sub-diagonal with
    M[k+1, k] = O[k].
  - every stage has the same static signature: first ``p`` columns +1
    (primal), the remaining w-p columns -1 (equality multipliers).
  - arrow border: Bg: (K, w, g) coupling stages to the global block,
    Cg: (g, g) with its own signature split ``p_glob``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

__all__ = [
    "signed_cholesky", "signed_block_tridiag_factor",
    "signed_block_tridiag_solve", "arrow_factor", "arrow_solve",
    "cr_factor", "cr_solve", "cr_arrow_factor", "cr_arrow_solve",
]

# matmul precision is governed by the caller's ambient
# jax.default_matmul_precision context (solve_staged_ipm sets it from
# IPMSettings.matmul_precision); None defers to that context
_P = None


def _sig(w: int, p: int, dtype):
    return jnp.concatenate([jnp.ones(p, dtype), -jnp.ones(w - p, dtype)])


def signed_cholesky(M, p: int):
    """Factor a quasidefinite M = L S L', S = diag(+1 x p, -1 x (w-p)).

    M = [[P, B'], [B, -N]] with P (p x p) SPD and N SPD (guaranteed by the
    +eps/-delta regularization).  L = [[L_P, 0], [Bt, L_N]] with
    P = L_P L_P', Bt = B L_P^{-T}, N + Bt Bt' = L_N L_N'.

    Always runs at full matmul precision regardless of the ambient
    context: under the mixed-precision KKT path the surrounding Schur
    algebra may run in bf16, but bf16 cancellation inside the Cholesky
    itself drives pivots below the +eps/-delta regularization floor and
    the factor NaNs out (measured on v5e).
    """
    with jax.default_matmul_precision("highest"):
        return _signed_cholesky_impl(M, p)


def _signed_cholesky_impl(M, p: int):
    w = M.shape[-1]
    if p == w:
        return jnp.linalg.cholesky(M)
    if p == 0:
        return jnp.linalg.cholesky(-M)
    Pb = M[..., :p, :p]
    B = M[..., p:, :p]
    N = -M[..., p:, p:]
    L_P = jnp.linalg.cholesky(Pb)
    # Bt = B L_P^{-T}  <=>  L_P Bt' = B'
    Bt = solve_triangular(L_P, jnp.swapaxes(B, -1, -2), lower=True)
    Bt = jnp.swapaxes(Bt, -1, -2)
    Np = N + Bt @ jnp.swapaxes(Bt, -1, -2)
    L_N = jnp.linalg.cholesky(Np)
    top = jnp.concatenate(
        [L_P, jnp.zeros(M.shape[:-2] + (p, w - p), M.dtype)], axis=-1)
    bot = jnp.concatenate([Bt, L_N], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def signed_block_tridiag_factor(D, O, p: int):
    """Stagewise M = L S L' for quasidefinite block-tridiagonal M.

    Returns (L_diag: (K, w, w), C_sub: (K-1, w, w)) where the factor's
    sub-diagonal blocks are L[k+1, k] = C_sub[k] @ diag(sig); solves only
    ever need C_sub itself.
    """
    w = D.shape[-1]
    sig = _sig(w, p, D.dtype)
    L0 = signed_cholesky(D[0], p)

    def step(L_prev, inputs):
        O_k, D_k = inputs
        # C = O L_prev^{-T}:  L_prev C' = O'
        C = solve_triangular(L_prev, O_k.T, lower=True)
        C = C.T
        Mk = D_k - (C * sig) @ C.T
        L_k = signed_cholesky(Mk, p)
        return L_k, (L_k, C)

    _, (L_rest, C_sub) = jax.lax.scan(step, L0, (O, D[1:]))
    L_diag = jnp.concatenate([L0[None], L_rest], axis=0)
    return L_diag, C_sub


def _fwd(L_diag, C_sub, sig, b):
    """u = L^{-1} b stagewise; b: (K, w, r)."""
    u0 = solve_triangular(L_diag[0], b[0], lower=True)

    def step(u_prev, inputs):
        L_k, C_k, b_k = inputs
        u_k = solve_triangular(
            L_k, b_k - (C_k * sig) @ u_prev, lower=True)
        return u_k, u_k

    _, u_rest = jax.lax.scan(step, u0, (L_diag[1:], C_sub, b[1:]))
    return jnp.concatenate([u0[None], u_rest], axis=0)


def _bwd(L_diag, C_sub, sig, v, tail_rhs=None):
    """x = L^{-T} v stagewise (v already sign-scaled); optional extra
    per-stage rhs subtracted (arrow border term)."""
    if tail_rhs is not None:
        v = v - tail_rhs
    xK = solve_triangular(L_diag[-1], v[-1], lower=True, trans=1)

    def step(x_next, inputs):
        L_k, C_k, v_k = inputs
        rhs = v_k - sig[:, None] * (C_k.T @ x_next)
        x_k = solve_triangular(L_k, rhs, lower=True, trans=1)
        return x_k, x_k

    _, x_rest = jax.lax.scan(
        step, xK, (L_diag[:-1][::-1], C_sub[::-1], v[:-1][::-1]))
    return jnp.concatenate([x_rest[::-1], xK[None]], axis=0)


def signed_block_tridiag_solve(L_diag, C_sub, p: int, b):
    """Solve M x = b given the signed factorization; b: (K, w) or (K, w, r)."""
    w = L_diag.shape[-1]
    sig = _sig(w, p, L_diag.dtype)
    squeeze = b.ndim == 2
    if squeeze:
        b = b[..., None]
    u = _fwd(L_diag, C_sub, sig, b)
    x = _bwd(L_diag, C_sub, sig, sig[:, None] * u)
    return x[..., 0] if squeeze else x


# ---------------------------------------------------------------------------
# Cyclic reduction (block odd-even elimination)
#
# The sequential factor/solve above serializes K stages; inside a jitted
# IPM loop that is ~hundreds of tiny latency-bound ops per iteration — the
# dominant cost on TPU (measured: ~15 ms per IPM iteration at K=30).
# Cyclic reduction eliminates the odd-indexed stages of the quasidefinite
# system level by level: ceil(log2 K) levels, each one a handful of ops
# *batched over all eliminated stages* — MXU-shaped batched Cholesky /
# matmuls instead of a K-step scan.  Quasidefiniteness is closed under
# Schur complements onto principal submatrices with the same per-stage
# signature (Vanderbei 1995), so every level factors with the same signed
# Cholesky and no pivoting.
#
# Triangular factors are inverted explicitly once per factorization
# (one batched triangular solve against I); the solve sweeps are then
# pure batched matmuls, which matters because each IPM iteration reuses
# one factorization for ~6 solves.
# ---------------------------------------------------------------------------


def _sandwich(Xt, sig, Y):
    """X' S Y for stacked blocks: (n, w, a)' x sig x (n, w, b)."""
    return jnp.einsum("nwa,nwb->nab", Xt * sig[:, None], Y, precision=_P)


def cr_factor(D, O, p: int):
    """Cyclic-reduction factorization of the signed block-tridiagonal M.

    D: (K, w, w) diagonal blocks, O: (K-1, w, w) with M[k+1, k] = O[k].
    Returns an opaque pytree for :func:`cr_solve`: per level the inverted
    triangular factor of the eliminated odd blocks and the coupling blocks
    R = L^-1 M[j, j-1], Q = L^-1 M[j, j+1], plus the root block inverse
    factors.  All level shapes are static functions of K.
    """
    w = D.shape[-1]
    sig = _sig(w, p, D.dtype)
    I_w = jnp.eye(w, dtype=D.dtype)
    levels = []
    n = D.shape[0]
    while n > 1:
        n_odd = n // 2
        n_even = n - n_odd
        D_odd = D[1::2]
        # pad the super-diagonal so the last odd stage (when n is even)
        # sees a zero right coupling
        O_pad = jnp.concatenate(
            [O, jnp.zeros((1, w, w), D.dtype)], axis=0)[:2 * n_odd]
        O_left = O_pad[0::2]                     # M[j, j-1], j = 2m+1
        O_rt = O_pad[1::2]                       # M[j+1, j] -> M[j, j+1]'
        L = signed_cholesky(D_odd, p)
        Linv = solve_triangular(
            L, jnp.broadcast_to(I_w, (n_odd, w, w)), lower=True)
        R = jnp.einsum("nab,nbc->nac", Linv, O_left, precision=_P)
        Q = jnp.einsum("nab,ncb->nac", Linv, O_rt, precision=_P)

        D_even = D[0::2]
        D_even = D_even.at[:n_odd].add(-_sandwich(R, sig, R))
        D_even = D_even.at[1:].add(-_sandwich(Q, sig, Q)[:n_even - 1])
        O_even = -_sandwich(Q, sig, R)[:n_even - 1]

        levels.append((Linv, R, Q))
        D, O, n = D_even, O_even, n_even

    L_root = signed_cholesky(D[0], p)
    Linv_root = solve_triangular(L_root, I_w, lower=True)
    return (tuple(levels), Linv_root, p)


def cr_solve(fact, b):
    """Solve M x = b given :func:`cr_factor`; b: (K, w) or (K, w, r)."""
    levels, Linv_root, p = fact
    w = Linv_root.shape[-1]
    sig = _sig(w, p, Linv_root.dtype)
    squeeze = b.ndim == 2
    if squeeze:
        b = b[..., None]

    # down-sweep: eliminate odd rhs level by level
    ts = []
    for Linv, R, Q in levels:
        n = b.shape[0]
        n_odd = n // 2
        n_even = n - n_odd
        t = jnp.einsum("nab,nbr->nar", Linv, b[1::2], precision=_P)
        b_even = b[0::2]
        b_even = b_even.at[:n_odd].add(
            -jnp.einsum("nab,nar->nbr", R * sig[None, :, None], t,
                        precision=_P))
        b_even = b_even.at[1:].add(
            -jnp.einsum("nab,nar->nbr", Q * sig[None, :, None], t,
                        precision=_P)[:n_even - 1])
        ts.append(t)
        b = b_even

    # root
    u = Linv_root @ b[0]
    x = (jnp.swapaxes(Linv_root, -1, -2) @ (sig[:, None] * u))[None]

    # up-sweep: recover odd unknowns
    for (Linv, R, Q), t in zip(reversed(levels), reversed(ts)):
        n_even = x.shape[0]
        n_odd = t.shape[0]
        n = n_even + n_odd
        x_pad = jnp.concatenate(
            [x, jnp.zeros((1,) + x.shape[1:], x.dtype)], axis=0)
        rhs = (t
               - jnp.einsum("nab,nbr->nar", R, x[:n_odd], precision=_P)
               - jnp.einsum("nab,nbr->nar", Q, x_pad[1:n_odd + 1],
                            precision=_P))
        x_odd = jnp.einsum("nba,nbr->nar", Linv, sig[:, None] * rhs,
                           precision=_P)
        full = jnp.zeros((n,) + x.shape[1:], x.dtype)
        full = full.at[0::2].set(x).at[1::2].set(x_odd)
        x = full

    return x[..., 0] if squeeze else x


def cr_arrow_factor(D, O, Bg, Cg, p: int, p_glob: int):
    """Cyclic-reduction factorization of the arrow matrix
    [[T, Bg], [Bg', Cg]]: CR on the block-tridiagonal T plus a dense
    signed factorization of the global Schur complement
    S = Cg - Bg' T^-1 Bg (quasidefinite with the same signature as Cg)."""
    g = Cg.shape[-1]
    fact_T = cr_factor(D, O, p)
    Y = cr_solve(fact_T, Bg)                                 # T^-1 Bg
    S = Cg - jnp.einsum("kwg,kwh->gh", Bg, Y, precision=_P)
    S = 0.5 * (S + S.T)
    L_S = signed_cholesky(S, p_glob)
    LSinv = solve_triangular(L_S, jnp.eye(g, dtype=D.dtype), lower=True)
    return (fact_T, Bg, Y, LSinv, p_glob)


def cr_arrow_solve(fact, b_stage, b_glob):
    """Solve the arrow system from :func:`cr_arrow_factor`;
    b_stage: (K, w) or (K, w, r), b_glob: (g,) or (g, r)."""
    fact_T, Bg, Y, LSinv, p_glob = fact
    g = LSinv.shape[-1]
    sig_g = _sig(g, p_glob, LSinv.dtype)
    squeeze = b_stage.ndim == 2
    if squeeze:
        b_stage = b_stage[..., None]
        b_glob = b_glob[..., None]
    u = cr_solve(fact_T, b_stage)                            # T^-1 b
    rhs_g = b_glob - jnp.einsum("kwg,kwr->gr", Bg, u, precision=_P)
    x_g = jnp.swapaxes(LSinv, -1, -2) @ (sig_g[:, None] * (LSinv @ rhs_g))
    x_stage = u - jnp.einsum("kwg,gr->kwr", Y, x_g, precision=_P)
    if squeeze:
        return x_stage[..., 0], x_g[..., 0]
    return x_stage, x_g


def arrow_factor(D, O, Bg, Cg, p: int, p_glob: int):
    """Factor the arrow matrix [[T, Bg], [Bg', Cg]] with T block-tridiag.

    Returns an opaque tuple for :func:`arrow_solve`.
    """
    w = D.shape[-1]
    sig = _sig(w, p, D.dtype)
    L_diag, C_sub = signed_block_tridiag_factor(D, O, p)
    # Y = L_T^{-1} Bg  (stagewise forward with g right-hand sides)
    Y = _fwd(L_diag, C_sub, sig, Bg)
    S = Cg - jnp.einsum("kwg,kwh->gh", Y * sig[:, None], Y, precision=_P)
    L_S = signed_cholesky(S, p_glob)
    return (L_diag, C_sub, Y, L_S, p, p_glob)


def arrow_solve(fact, b_stage, b_glob):
    """Solve the arrow system; b_stage: (K, w) or (K, w, r), b_glob: (g,)
    or (g, r).  Returns (x_stage, x_glob)."""
    L_diag, C_sub, Y, L_S, p, p_glob = fact
    w = L_diag.shape[-1]
    g = L_S.shape[-1]
    sig = _sig(w, p, L_diag.dtype)
    sig_g = _sig(g, p_glob, L_diag.dtype)
    squeeze = b_stage.ndim == 2
    if squeeze:
        b_stage = b_stage[..., None]
        b_glob = b_glob[..., None]
    u = _fwd(L_diag, C_sub, sig, b_stage)
    u_g = solve_triangular(
        L_S,
        b_glob - jnp.einsum("kwg,kwr->gr", Y * sig[:, None], u,
                            precision=_P),
        lower=True)
    x_g = solve_triangular(L_S, sig_g[:, None] * u_g, lower=True, trans=1)
    tail = sig[:, None] * jnp.einsum("kwg,gr->kwr", Y, x_g, precision=_P)
    x_stage = _bwd(L_diag, C_sub, sig, sig[:, None] * u, tail_rhs=tail)
    if squeeze:
        return x_stage[..., 0], x_g[..., 0]
    return x_stage, x_g
