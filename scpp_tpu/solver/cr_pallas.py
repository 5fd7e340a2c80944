"""Pallas TPU kernel: fused cyclic-reduction KKT solve.

The staged IPM's dominant cost is op-dispatch overhead, not flops: one
cyclic-reduction solve (staged_kkt.cr_solve) executes ~60 small XLA ops
at (K<=30, Wp<=48) shapes, each costing tens of microseconds of fixed
overhead on TPU, and each IPM iteration runs ~6 such solves (predictor /
corrector / refinement sweeps). Measured at flagship shapes, every
constituent op is <0.2 ms while one solver iteration is ~8.6 ms — pure
pass-count. This kernel runs the ENTIRE down-sweep / root / up-sweep as
ONE Pallas dispatch with all factor blocks resident in VMEM.

Mosaic-proofing (the r02 lesson: `.at[...]` scatters and strided slices
are unimplemented on TPU):
  - the per-level odd/even block bookkeeping is unrolled into Python
    lists of (1, Wp) row vectors — every array op in the kernel is a
    static 2D slice, an elementwise op, or a (1, Wp) @ (Wp, Wp) matmul;
  - factor blocks are lane-packed per level into (Wp, NO*Wp) planes, so
    block m is the static slice [:, m*Wp:(m+1)*Wp];
  - both each block and its transpose are packed, avoiding in-kernel
    transposes (row-vector form: (M v)^T = v_row @ M^T).

Numerical semantics are identical to staged_kkt.cr_solve (same block
recurrences, reassociated only at the fp roundoff level); equivalence is
tested in interpreter mode in tests/test_cr_pallas.py and compiled on
the chip by the TPU smoke suite.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cr_level_sizes", "cr_pack", "cr_solve_fused"]


def cr_level_sizes(K: int):
    """Static level structure: [(n_blocks, n_odd), ...] until n==1."""
    sizes = []
    n = K
    while n > 1:
        o = n // 2
        sizes.append((n, o))
        n = n - o
    return sizes


def _pack_blocks(blocks, NO, Wp):
    """(n, Wp, Wp) -> (Wp, NO*Wp) lane-packed plane (pad blocks zero)."""
    n = blocks.shape[0]
    pad = jnp.zeros((NO - n, Wp, Wp), blocks.dtype)
    full = jnp.concatenate([blocks, pad], axis=0)       # (NO, Wp, Wp)
    return jnp.transpose(full, (1, 0, 2)).reshape(Wp, NO * Wp)


def cr_pack(fact, K: int):
    """Pack a staged_kkt.cr_factor result for the fused kernel.

    Returns (packed_dict, p) with six (L, Wp, NO*Wp) planes — each level's
    Linv / Linv^T / R / R^T / Q / Q^T blocks — plus the root inverse pair.
    """
    levels, Linv_root, p = fact
    sizes = cr_level_sizes(K)
    assert len(levels) == len(sizes)
    Wp = Linv_root.shape[-1]
    NO = max(o for _, o in sizes)
    planes = {k: [] for k in ("linv", "linvT", "r", "rT", "q", "qT")}
    for (Linv, R, Q), (_, o) in zip(levels, sizes):
        planes["linv"].append(_pack_blocks(Linv, NO, Wp))
        planes["linvT"].append(_pack_blocks(
            jnp.swapaxes(Linv, -1, -2), NO, Wp))
        planes["r"].append(_pack_blocks(R, NO, Wp))
        planes["rT"].append(_pack_blocks(jnp.swapaxes(R, -1, -2), NO, Wp))
        planes["q"].append(_pack_blocks(Q, NO, Wp))
        planes["qT"].append(_pack_blocks(jnp.swapaxes(Q, -1, -2), NO, Wp))
    packed = {k: jnp.stack(v) for k, v in planes.items()}
    packed["root"] = Linv_root                          # (Wp, Wp)
    packed["rootT"] = Linv_root.T
    return packed, p


def _cr_fused_kernel(K, Wp, NO, p, sizes,
                     linv_ref, linvT_ref, r_ref, rT_ref, q_ref, qT_ref,
                     root_ref, rootT_ref, b_ref, x_ref):
    dtype = b_ref.dtype

    def blk(ref, l, m):
        return ref[l, :, m * Wp:(m + 1) * Wp]           # (Wp, Wp)

    # signature built in-kernel (a captured constant array is rejected by
    # pallas_call): +1 on the first p lanes, -1 after
    col = jax.lax.broadcasted_iota(jnp.int32, (1, Wp), 1)
    sig = jnp.where(col < p, 1.0, -1.0).astype(dtype)   # (1, Wp)
    # current active blocks as unrolled (1, Wp) rows
    cur = [b_ref[i:i + 1, :] for i in range(K)]

    # ---- down-sweep ----
    ts = []
    for l, (n, o) in enumerate(sizes):
        ev = [cur[2 * m] for m in range((n + 1) // 2)]
        t_l = []
        for m in range(o):
            od = cur[2 * m + 1]
            t = od @ blk(linvT_ref, l, m)               # (Linv b_odd)^T
            t_l.append(t)
            st = sig * t
            ev[m] = ev[m] - st @ blk(r_ref, l, m)       # R^T (sig t)
            if m + 1 < len(ev):
                ev[m + 1] = ev[m + 1] - st @ blk(q_ref, l, m)
        ts.append(t_l)
        cur = ev

    # ---- root ----
    u = cur[0] @ rootT_ref[:]
    cur = [(sig * u) @ root_ref[:]]

    # ---- up-sweep ----
    for l in range(len(sizes) - 1, -1, -1):
        n, o = sizes[l]
        full = [None] * n
        for m in range(len(cur)):
            if 2 * m < n:
                full[2 * m] = cur[m]
        for m in range(o):
            left = cur[m]
            right = cur[m + 1] if m + 1 < len(cur) \
                else jnp.zeros((1, Wp), dtype)
            rhs = (ts[l][m] - left @ blk(rT_ref, l, m)
                   - right @ blk(qT_ref, l, m))
            full[2 * m + 1] = (sig * rhs) @ blk(linv_ref, l, m)
        cur = full

    for i in range(K):
        x_ref[i:i + 1, :] = cur[i]


@partial(jax.jit, static_argnums=(2, 3))
def cr_solve_fused(packed, b, p: int, interpret: bool = False):
    """Solve M x = b with the fused kernel; b: (K, Wp).

    ``packed`` from :func:`cr_pack`. Single right-hand side only (the IPM
    path); multi-RHS callers use staged_kkt.cr_solve.
    """
    K, Wp = b.shape
    sizes = cr_level_sizes(K)
    NO = packed["linv"].shape[2] // Wp

    kern = partial(_cr_fused_kernel, K, Wp, NO, p, sizes)
    spec_plane = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((K, Wp), b.dtype),
        in_specs=[spec_plane] * 9,
        out_specs=spec_plane,
        interpret=interpret,
    )(packed["linv"], packed["linvT"], packed["r"], packed["rT"],
      packed["q"], packed["qT"], packed["root"], packed["rootT"], b)
