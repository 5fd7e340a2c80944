"""Mosaic-safe batched linear-algebra blocks for the monolithic IPM kernel.

The round-4 profile (PERF.md §2/§5) shows the staged IPM is op-dispatch
bound: ~300 small XLA ops per iteration at tens of microseconds of fixed
overhead each, while the constituent flops would take ~0.1 ms. The fix
(VERDICT r04 #1) is a monolithic Pallas kernel running entire IPM
iterations in one dispatch. This module provides the factorization
layer of that kernel: batched signed (quasidefinite) Cholesky, batched
triangular inverse, and cyclic reduction — written against the subset of
jnp that Mosaic TPU lowers efficiently (measured on v5e, see
tools/diag/mono_probe.py):

  - batched ``dot_general`` on (n, w, w) blocks: ~1.4 us at n=240, w=48,
    full fp32 accuracy with precision=HIGHEST;
  - 3D/4D elementwise and single rank-1 broadcast outer products
    vectorize fully;
  - NO dynamic_slice on non-minor dims, NO scatter (.at[i].set on a
    middle dim), NO strided leading slices, NO >2D gathers: every index
    below is Python-static, every "scatter" is a one-hot mask add, every
    odd/even split is a reshape + static index.

Everything here is *pure jnp on values* — usable identically inside a
Pallas kernel body, under plain jit on CPU (how the unit tests check it
against solver/staged_kkt), and in interpreter mode.

Factorization layout (mirrors staged_kkt): blocks (n, w, w) with
signature +1 on the first ``p`` columns, -1 on the rest; panel width 8
requires p % 8 == 0 and w % 8 == 0 (flagship: w=48, p=32).

Replaces ECOS's sparse LDL (SURVEY §2 V3) at the kernel level; the
reference solves each subproblem with an in-process ECOS call
(scpp_core/src/SCAlgorithm.cpp:77-81).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST

__all__ = [
    "bdot", "chol8", "tri_inv8", "signed_chol_panels", "panels_to_dense",
    "signed_chol_inv", "mono_cr_factor", "mono_cr_solve", "cr_sizes",
]


def bdot(a, b, tb=False):
    """Batched matmul over leading dim: (n, i, k) @ (n, k, j) -> (n, i, j).

    ``tb=True`` contracts b's last dim instead ((n, j, k) -> a @ b^T),
    avoiding materialized transposes."""
    if tb:
        dn = (((2,), (2,)), ((0,), (0,)))
    else:
        dn = (((2,), (1,)), ((0,), (0,)))
    return jax.lax.dot_general(a, b, dn, precision=_HI,
                               preferred_element_type=a.dtype)


def bmv(M, v):
    """Batched matvec (n, i, j) @ (n, j) -> (n, i) via broadcast+reduce
    (measured faster than batched-GEMV dot_general on Mosaic)."""
    return jnp.sum(M * v[:, None, :], axis=2)


def bmv_t(M, v):
    """Batched transpose-matvec (n, i, j), (n, i) -> (n, j)."""
    return jnp.sum(M * v[:, :, None], axis=1)


def _onehot(j, n, dtype):
    return (jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) == j
            ).astype(dtype)                                   # (1, n)


def chol8(P):
    """Batched Cholesky of SPD (n, 8, 8) blocks.

    Right-looking column recurrence as a fori_loop with MASK-based
    column extraction (iota == j with a traced j): the statically
    unrolled form multiplied Mosaic compile time by the number of call
    sites x columns and pushed the whole-solve kernel past a 15-minute
    compile. All "indexing" is comparisons + masked reductions, so the
    loop body is ~8 vector ops compiled once per call site."""
    dtype = P.dtype
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)       # (1, 8)

    def step(j, PL):
        P, L = PL
        ohc = (col == j).astype(dtype)                         # (1, 8)
        colv = jnp.sum(P * ohc[:, None, :], axis=2)            # P[:, :, j]
        t = jnp.maximum(jnp.sum(colv * ohc, axis=1, keepdims=True),
                        1e-30)                                 # P[:, j, j]
        ell = jnp.where(col >= j, colv, 0.0) * jax.lax.rsqrt(t)
        P = P - ell[:, :, None] * ell[:, None, :]
        L = L + ell[:, :, None] * ohc[:, None, :]
        return (P, L)

    _, L = jax.lax.fori_loop(0, 8, step, (P, jnp.zeros_like(P)))
    return L


def tri_inv8(L):
    """Batched inverse of lower-triangular (n, 8, 8); mask-based row
    recurrence row_j(X) = (e_j - L[j,:] X) / L[j,j] (see chol8)."""
    dtype = L.dtype
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)       # (1, 8)

    def step(j, X):
        ohc = (col == j).astype(dtype)
        Lrow = jnp.sum(L * ohc[:, :, None], axis=1)            # L[:, j, :]
        s = jnp.sum(Lrow[:, :, None] * X, axis=1)              # (n, 8)
        diag = jnp.sum(Lrow * ohc, axis=1, keepdims=True)
        r = (ohc - s) / diag
        return X + r[:, None, :] * ohc[:, :, None]

    return jax.lax.fori_loop(0, 8, step, jnp.zeros_like(L))


def signed_chol_panels(M, p: int, panel: int = 8):
    """Batched signed Cholesky M = L S L' of quasidefinite (n, w, w).

    S = diag(+1 x p, -1 x (w-p)); requires p % panel == 0, w % panel == 0
    so every panel has a uniform sign. Returns per-panel blocks:
      diag[q]   = L_qq           (n, panel, panel)
      diag_inv[q] = L_qq^{-1}
      sub[q][r] = L[q, r] block  (q > r)
    The O(w^3) work rides batched dot_general (MXU); only the 8-wide
    base case is a column recurrence."""
    n, w, _ = M.shape
    assert w % panel == 0 and p % panel == 0, (w, p, panel)
    nP = w // panel
    signs = [1.0 if q * panel < p else -1.0 for q in range(nP)]
    diag, diag_inv = [], []
    sub = [[None] * nP for _ in range(nP)]
    # trailing submatrix, full width kept with static slicing per panel
    T = M
    for q in range(nP):
        a = q * panel
        s = signs[q]
        Dq = s * T[:, a:a + panel, a:a + panel]
        Lq = chol8(Dq)
        Lq_inv = tri_inv8(Lq)
        diag.append(Lq)
        diag_inv.append(Lq_inv)
        if q + 1 < nP:
            b = a + panel
            # Lsub = s * T[b:, a:b] @ Lq^{-T}
            Lsub = s * bdot(T[:, b:, a:a + panel], Lq_inv, tb=True)
            for r in range(q + 1, nP):
                sub[r][q] = Lsub[:, (r - q - 1) * panel:(r - q) * panel, :]
            # trailing update: T[b:, b:] -= s * Lsub Lsub^T ; keep full
            # shape by padding the update back to (w, w) with zeros
            upd = s * bdot(Lsub, Lsub, tb=True)        # (n, w-b, w-b)
            pad = jnp.zeros((n, b, w), M.dtype)
            padded = jnp.concatenate([
                pad,
                jnp.concatenate([jnp.zeros((n, w - b, b), M.dtype), upd],
                                axis=2)], axis=1)
            T = T - padded
    return diag, diag_inv, sub, signs


def panels_to_dense(diag, diag_inv, sub, panel: int):
    """Assemble L and L^{-1} (n, w, w) from panel blocks.

    L^{-1} block rows via back-substitution over panels:
      X[q][q] = diag_inv[q];  X[q][r] = -diag_inv[q] @ sum_{r<=t<q} sub[q][t] X[t][r]
    """
    nP = len(diag)
    n = diag[0].shape[0]
    dtype = diag[0].dtype
    zero = jnp.zeros((n, panel, panel), dtype)
    X = [[None] * nP for _ in range(nP)]
    for q in range(nP):
        X[q][q] = diag_inv[q]
        for r in range(q - 1, -1, -1):
            acc = None
            for t in range(r, q):
                term = bdot(sub[q][t], X[t][r])
                acc = term if acc is None else acc + term
            X[q][r] = -bdot(diag_inv[q], acc)
    rows_L, rows_X = [], []
    for q in range(nP):
        row_l = [sub[q][r] for r in range(q)] + [diag[q]] + \
            [zero] * (nP - q - 1)
        row_x = [X[q][r] for r in range(q)] + [diag_inv[q]] + \
            [zero] * (nP - q - 1)
        rows_L.append(jnp.concatenate(row_l, axis=2))
        rows_X.append(jnp.concatenate(row_x, axis=2))
    return (jnp.concatenate(rows_L, axis=1),
            jnp.concatenate(rows_X, axis=1))


def signed_chol_inv(M, p: int, panel: int = 8):
    """L, L^{-1} of the signed factorization of (n, w, w) quasidefinite M."""
    diag, diag_inv, sub, _ = signed_chol_panels(M, p, panel)
    return panels_to_dense(diag, diag_inv, sub, panel)


# ---------------------------------------------------------------------------
# cyclic reduction, Mosaic-safe (mirrors staged_kkt.cr_factor/cr_solve)
# ---------------------------------------------------------------------------


def cr_sizes(K: int):
    """[(n, n_odd), ...] level structure (same as cr_pallas.cr_level_sizes)."""
    sizes = []
    n = K
    while n > 1:
        o = n // 2
        sizes.append((n, o))
        n = n - o
    return sizes


def _sig_row(w: int, p: int, dtype):
    col = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    return jnp.where(col < p, 1.0, -1.0).astype(dtype)         # (1, w)


def _odd_even(x, n: int):
    """(B, n, ...) -> (evens (B, n-n//2, ...), odds (B, n//2, ...)) via
    pad-to-even reshape + static index (no strided leading slices)."""
    B = x.shape[0]
    n_odd = n // 2
    n_even = n - n_odd
    if n % 2:
        pad = jnp.zeros((B, 1) + x.shape[2:], x.dtype)
        x2 = jnp.concatenate([x, pad], axis=1)
    else:
        x2 = x
    xr = x2.reshape((B, (n + 1) // 2, 2) + x.shape[2:])
    ev = xr[:, :, 0]
    od = xr[:, :, 1][:, :n_odd]
    return ev[:, :n_even], od


def _interleave(ev, od, n: int):
    """Inverse of _odd_even: evens/odds -> (B, n, ...)."""
    B = ev.shape[0]
    n_odd = n // 2
    n_half = (n + 1) // 2
    if od.shape[1] < n_half:
        pad = jnp.zeros((B, n_half - od.shape[1]) + od.shape[2:], od.dtype)
        od = jnp.concatenate([od, pad], axis=1)
    if ev.shape[1] < n_half:
        pad = jnp.zeros((B, n_half - ev.shape[1]) + ev.shape[2:], ev.dtype)
        ev = jnp.concatenate([ev, pad], axis=1)
    x = jnp.stack([ev, od], axis=2)                  # (B, n_half, 2, ...)
    return x.reshape((B, 2 * n_half) + ev.shape[2:])[:, :n]


def _shift_down1(x):
    """(B, n, ...) -> same with entry i holding x[i-1] (x[-1] dropped,
    slot 0 zero): the Mosaic-safe form of .at[1:].add's alignment."""
    if x.shape[1] == 1:
        return jnp.zeros_like(x)           # 0-sized slices break Mosaic
    B = x.shape[0]
    z = jnp.zeros((B, 1) + x.shape[2:], x.dtype)
    return jnp.concatenate([z, x[:, :-1]], axis=1)


def _pad_tail(x, n: int):
    """Pad dim 1 with zeros up to n."""
    B = x.shape[0]
    if x.shape[1] == n:
        return x
    z = jnp.zeros((B, n - x.shape[1]) + x.shape[2:], x.dtype)
    return jnp.concatenate([x, z], axis=1)


def _flat(x):
    """(B, n, a, b) -> (B*n, a, b) (leading merge; layout-free)."""
    return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])


def _unflat(x, B: int):
    return x.reshape((B, x.shape[0] // B) + x.shape[1:])


def mono_cr_factor(D, O, p: int):
    """Cyclic-reduction factorization, batched over scenarios.

    D: (B, K, w, w) diagonal blocks, O: (B, K-1, w, w) sub-diagonal
    (M[k+1, k] = O[k]). Returns levels [(Linv, R, Q), ...] with leading
    (B, n_odd, w, w) plus the root (B, w, w) inverse factor. Same block
    recurrences as staged_kkt.cr_factor (reassociated at roundoff only).
    """
    B, K, w, _ = D.shape
    dtype = D.dtype
    sig = _sig_row(w, p, dtype)                                # (1, w)
    levels = []
    n = K
    while n > 1:
        n_odd = n // 2
        n_even = n - n_odd
        D_even, D_odd = _odd_even(D, n)
        # O_pad: (B, 2*n_odd, w, w); O_left = evens, O_rt = odds
        O_pad = _pad_tail(O, 2 * n_odd)[:, :2 * n_odd]
        O_left, O_rt = _odd_even(O_pad, 2 * n_odd)
        O_left = O_left[:, :n_odd]

        L, Linv = signed_chol_inv(_flat(D_odd), p)
        R = bdot(Linv, _flat(O_left))
        Q = bdot(Linv, _flat(O_rt), tb=True)
        # Schur updates: D_even[:n_odd] -= R' S R; D_even[1:] -= (Q' S Q)
        # sandwich X' S Y contracts the ROW dim (staged_kkt._sandwich)
        sig3 = sig[:, :, None]                                 # (1, w, 1)
        StR = _unflat(jax.lax.dot_general(
            R * sig3, R, (((1,), (1,)), ((0,), (0,))),
            precision=_HI, preferred_element_type=dtype), B)
        StQ = _unflat(jax.lax.dot_general(
            Q * sig3, Q, (((1,), (1,)), ((0,), (0,))),
            precision=_HI, preferred_element_type=dtype), B)
        StQR = _unflat(jax.lax.dot_general(
            Q * sig3, R, (((1,), (1,)), ((0,), (0,))),
            precision=_HI, preferred_element_type=dtype), B)
        D_even = D_even - _pad_tail(StR, n_even)
        D_even = D_even - _shift_down1(_pad_tail(StQ, n_even))
        # n_even == 1 ends the recursion; never materialize a 0-sized O
        O_even = -StQR[:, :n_even - 1] if n_even > 1 else None

        levels.append((_unflat(Linv, B), _unflat(R, B), _unflat(Q, B)))
        D, O, n = D_even, O_even, n_even

    L_root, Linv_root = signed_chol_inv(D[:, 0], p)
    return levels, Linv_root


def mono_cr_solve(fact, b, p: int):
    """Solve M x = b for b: (B, K, w); fact from mono_cr_factor."""
    levels, Linv_root = fact
    B = b.shape[0]
    K = b.shape[1]
    w = b.shape[2]
    dtype = b.dtype
    sig = _sig_row(w, p, dtype)                                # (1, w)

    # down-sweep
    ts, ns = [], []
    n = K
    for (Linv, R, Q) in levels:
        n_odd = n // 2
        n_even = n - n_odd
        b_even, b_odd = _odd_even(b, n)
        t = _unflat(bmv(_flat(Linv), _flat(b_odd)), B)        # (B,n_odd,w)
        st = t * sig[None]
        rb = _unflat(bmv_t(_flat(R), _flat(st)), B)           # R' (sig t)
        qb = _unflat(bmv_t(_flat(Q), _flat(st)), B)
        b_even = b_even - _pad_tail(rb, n_even)
        b_even = b_even - _shift_down1(_pad_tail(qb, n_even))
        ts.append(t)
        ns.append(n)
        b, n = b_even, n_even

    # root: x = Linv_root' (sig * (Linv_root b))
    u = jnp.sum(Linv_root * b[:, 0:1, :], axis=2)              # (B, w)
    x0 = jnp.sum(Linv_root * (sig * u)[:, :, None], axis=1)    # (B, w)
    x = x0[:, None, :]

    # up-sweep
    for (Linv, R, Q), t, n in zip(reversed(levels), reversed(ts),
                                  reversed(ns)):
        n_odd = n // 2
        x_pad = jnp.concatenate(
            [x, jnp.zeros((B, 1, w), dtype)], axis=1)
        rhs = (t
               - _unflat(bmv(_flat(R), _flat(x[:, :n_odd])), B)
               - _unflat(bmv(_flat(Q), _flat(x_pad[:, 1:n_odd + 1])), B))
        x_odd = _unflat(bmv_t(_flat(Linv),
                              _flat(rhs * sig[None])), B)
        x = _interleave(x, x_odd, n)
    return x
