"""Fused discretization / resimulation Pallas kernels (VERDICT r04 #6).

The multiple-shooting discretization and the SCvx resimulation are RK
stage chains over (batch x interval)-vmapped small states: under XLA
each stage's flow map + Jacobian evaluation emits dozens of small ops,
each paying the measured ~26 us fixed per-op cost on the attached chip
(see PERF.md §2) — 34 ms (discretize) + 26 ms (resim) of the ~126 ms
SCvx step at batch 64. These kernels run the ENTIRE fixed-step RK
integration — all substeps, all stages, flow + forward-mode Jacobians —
as one Pallas dispatch, with the substep loop a lax.scan (compiled
once) and tableau coefficients as Python floats (rk_step is already
kernel-safe).

The math is literally ops/discretization._multiple_shooting_impl and
algos/common.interval_resimulation vmapped inside the kernel body —
numerics identical to the unfused path (same reassociation), verified
in tests/test_disc_mono.py.

Like solver/ipm_mono.py, callers under jax.vmap are routed through a
custom_vmap rule so the whole scenario batch lands in ONE kernel.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scpp_tpu.trajectory import DiscretizationData, TrajectoryData

__all__ = ["multiple_shooting_fused", "nonlinear_defect_cost_fused"]


def _spec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _tableau_arrays(method):
    """a-matrix (S, S) — passed as a kernel INPUT (captured constants
    are rejected); b and c stay Python floats (static)."""
    import numpy as np

    from scpp_tpu.ops.integrators import TABLEAUS
    c, a_rows, b = TABLEAUS[method]
    S = len(c)
    A = np.zeros((S, S), np.float64)
    for i, row in enumerate(a_rows):
        A[i, :len(row)] = row
    return A


def _rk_fori(G, state0, substeps, A2, method):
    """Fixed-step RK with the STAGE loop as a fori (one compiled body —
    the unrolled 7-stage jvp'd body pushed Mosaic compile past 25 min).

    Stage slopes live in VMEM scratch slots (run_scoped): slot writes
    use pl.ds on the leading dim (the one dynamic indexing Mosaic
    supports), slot reads are static, and stage weights are (1, 1)
    scalars — every broadcast Mosaic-legal. Numerics mirror
    integrators.rk_step: the masked-off upper-triangle contributes
    exact (h*0)*k = +0.0 terms in ascending order, and the final
    b-combination skips zero weights with Python-float coefficients,
    so results match the unrolled form bitwise. ``A2`` is the (S, S)
    a-matrix as a traced input; b/c come from the tableau statically.
    """
    from scpp_tpu.ops.integrators import TABLEAUS
    c_list, _, b_list = (TABLEAUS[method][0], TABLEAUS[method][1],
                         TABLEAUS[method][2])
    S = len(c_list)
    h = 1.0 / substeps
    dtype = state0[0].dtype
    A2 = A2.astype(dtype)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)

    def body(*krefs):
        # zero-init: stale slots multiply by exact 0.0 weights below,
        # which is only safe if they hold finite values
        for kref, leaf in zip(krefs, state0):
            kref[...] = jnp.zeros((S,) + leaf.shape, dtype)

        def step(istep, state):
            t0 = istep.astype(dtype) * h

            def stage(i, carry):
                ohr = (row_ids == i).astype(dtype)           # (S, 1)
                arow = jnp.sum(A2 * ohr, axis=0,
                               keepdims=True)                # (1, S)
                yi = []
                for leaf, kref in zip(state, krefs):
                    acc = leaf
                    for s in range(S):
                        acc = acc + (h * arow[:, s:s + 1]) * kref[s]
                    yi.append(acc)
                # stage time: sum_s [i == s] * c_s with static floats
                ci = jnp.zeros((), dtype)
                for s in range(S):
                    ci = ci + jnp.where(i == s, float(c_list[s]), 0.0)
                ki = G(tuple(yi), t0 + ci * h)
                for kref, kl in zip(krefs, ki):
                    kref[pl.ds(i, 1)] = kl[None]
                return carry

            jax.lax.fori_loop(0, S, stage, 0)
            out = []
            for leaf, kref in zip(state, krefs):
                acc = leaf
                for s in range(S):
                    if float(b_list[s]) != 0.0:
                        acc = acc + (h * float(b_list[s])) * kref[s]
                out.append(acc)
            return tuple(out)

        return jax.lax.fori_loop(0, substeps, step, state0)

    return pl.run_scoped(
        body, *[pltpu.VMEM((S,) + leaf.shape, dtype) for leaf in state0])


def _flow_jac_flat(model, xs, us, pars):
    """f, A, B for N flattened samples WITHOUT jacfwd.

    jacfwd's basis unflattening emits lane-split reshapes Mosaic cannot
    lower; instead the (n+m) tangent directions are pushed into the
    batch axis of ONE jvp over the vmapped flow map — all reshapes stay
    on leading dims."""
    N, n = xs.shape
    m = us.shape[-1]
    d = n + m
    dtype = xs.dtype

    def rep(a):
        return jnp.broadcast_to(a[:, None], (N, d) + a.shape[1:]
                                ).reshape((N * d,) + a.shape[1:])

    xr, ur, pr = rep(xs), rep(us), rep(pars)
    # tangent bases from iota (an eye+slice here lowered to a gather,
    # which Mosaic rejects): row r carries direction (r mod d)
    ri = jax.lax.broadcasted_iota(jnp.int32, (N * d, n), 0) % d
    ci = jax.lax.broadcasted_iota(jnp.int32, (N * d, n), 1)
    tx = (ri == ci).astype(dtype)
    riu = jax.lax.broadcasted_iota(jnp.int32, (N * d, m), 0) % d
    ciu = jax.lax.broadcasted_iota(jnp.int32, (N * d, m), 1)
    tu = (riu - n == ciu).astype(dtype)

    fb = jax.vmap(model.flow_map, in_axes=(0, 0, 0))
    f_out, t_out = jax.jvp(lambda x, u: fb(x, u, pr), (xr, ur), (tx, tu))
    J = t_out.reshape(N, d, n)
    f = f_out.reshape(N, d, n)[:, 0]
    A = jnp.swapaxes(J[:, :n, :], 1, 2)                 # (N, n, n)
    Bm = jnp.swapaxes(J[:, n:, :], 1, 2)                # (N, n, m)
    return f, A, Bm


def _disc_kernel(model, substeps, method, foh,
                 x_ref, u_ref, t_ref, par_ref, tabA_ref,
                 A_ref, B_ref, C_ref, z_ref):
    # single flattened (scenario x interval) batch: Mosaic matmuls allow
    # at most ONE batch dimension. The per-interval dt varies per
    # scenario, so the integration runs in NORMALIZED time tau in [0,1]
    # with the RHS scaled by dt — the same RK stage evaluations at the
    # same physical times as the unfused path (reassociated products
    # only).
    X, U, ts, par = x_ref[:], u_ref[:], t_ref[:], par_ref[:]
    tabA = tabA_ref[:]
    B, K, n = X.shape
    m = U.shape[-1]
    N = B * (K - 1)
    dtype = X.dtype
    p = par.shape[-1]

    x0 = X[:, :-1].reshape(N, n)
    u0 = U[:, :K - 1].reshape(N, m)
    u1 = (U[:, 1:K] if foh else U[:, :K - 1]).reshape(N, m)
    parN = jnp.broadcast_to(par[:, None, :], (B, K - 1, p)).reshape(N, p)
    dtN = jnp.broadcast_to(ts.reshape(B, 1, 1) / (K - 1),
                           (B, K - 1, 1)).reshape(N, 1)

    n_cols = n + m + (m if foh else 0) + 1

    def G(V, tau):
        x, Y = V
        u = u0 + tau * (u1 - u0) if foh else u0
        f, A, Bm = _flow_jac_flat(model, x, u, parN)
        Ax = jnp.sum(A * x[:, None, :], axis=2)
        Bu = jnp.sum(Bm * u[:, None, :], axis=2)
        r = f - Ax - Bu                                  # (N, n)
        cols = [jnp.zeros((N, n, n), dtype)]
        if foh:
            cols += [Bm * (1.0 - tau), Bm * tau]
        else:
            cols.append(Bm)
        cols.append(r[:, :, None])
        R = jnp.concatenate(cols, axis=2)               # (N, n, n_cols)
        dY = jax.lax.dot_general(
            A, Y, (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=dtype) + R
        dt3 = dtN[:, :, None]
        return (dtN * f, dt3 * dY)

    Y0 = jnp.broadcast_to(
        jnp.concatenate([jnp.eye(n, dtype=dtype),
                         jnp.zeros((n, n_cols - n), dtype)], axis=1)[None],
        (N, n, n_cols))
    _, Y = _rk_fori(G, (x0, Y0), substeps, tabA, method)

    A_ref[:] = Y[:, :, :n].reshape(B, K - 1, n, n)
    B_ref[:] = Y[:, :, n:n + m].reshape(B, K - 1, n, m)
    C_ref[:] = (Y[:, :, n + m:n + 2 * m] if foh
                else jnp.zeros((N, n, m), dtype)).reshape(B, K - 1, n, m)
    z_ref[:] = Y[:, :, n_cols - 1].reshape(B, K - 1, n)


def _bsub_of(B):
    """Scenarios per grid step: Mosaic compile time scales with per-op
    tensor size, so the batch is gridded; runtime is issue-bound and
    insensitive to the split (the ungridded flagship-shape kernel
    compiled for >20 min)."""
    for cand in (8, 4, 2, 1):
        if B % cand == 0:
            return cand
    return 1


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _disc_pallas(model, substeps, method, foh, interpret,
                 X, U, ts, par):
    B, K, n = X.shape
    m = U.shape[-1]
    p = par.shape[-1]
    dtype = X.dtype
    bs = _bsub_of(B)
    tabA = jnp.asarray(_tableau_arrays(method), dtype)
    S = tabA.shape[0]

    def bspec(shape):
        nd = len(shape)
        return pl.BlockSpec((bs,) + shape,
                            lambda i, _nd=nd: (i,) + (0,) * _nd,
                            memory_space=pltpu.VMEM)

    def shared(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    out_shapes = [
        jax.ShapeDtypeStruct((B, K - 1, n, n), dtype),
        jax.ShapeDtypeStruct((B, K - 1, n, m), dtype),
        jax.ShapeDtypeStruct((B, K - 1, n, m), dtype),
        jax.ShapeDtypeStruct((B, K - 1, n), dtype),
    ]
    return pl.pallas_call(
        partial(_disc_kernel, model, substeps, method, foh),
        grid=(B // bs,),
        out_shape=out_shapes,
        in_specs=[bspec((K, n)), bspec((K, m)), bspec((1,)),
                  bspec((p,)), shared((S, S))],
        out_specs=[bspec((K - 1, n, n)), bspec((K - 1, n, m)),
                   bspec((K - 1, n, m)), bspec((K - 1, n))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(X, U, ts, par, tabA)


@lru_cache(maxsize=16)
def _disc_entry(model, substeps, method, foh, interpret):
    def base(X, U, t, par):
        # unbatched call: tile to 8 (single-row reductions hit Mosaic
        # relayout bugs; the kernel is issue-bound so padding is cheap)
        def t8(a):
            return jnp.broadcast_to(a[None], (8,) + a.shape)
        A, Bm, C, z = _disc_pallas(model, substeps, method, foh,
                                   interpret, t8(X), t8(U),
                                   t8(t[None]), t8(par))
        return A[0], Bm[0], C[0], z[0]

    fn = jax.custom_batching.custom_vmap(base)

    @fn.def_vmap
    def _rule(axis_size, in_batched, X, U, t, par):
        def bc(leaf, b):
            return leaf if b else jnp.broadcast_to(
                leaf[None], (axis_size,) + leaf.shape)
        Xb = bc(X, in_batched[0])
        Ub = bc(U, in_batched[1])
        tb = bc(t, in_batched[2])[:, None]
        parb = bc(par, in_batched[3])
        out = _disc_pallas(model, substeps, method, foh, interpret,
                           Xb, Ub, tb, parb)
        return out, jax.tree_util.tree_map(lambda _: True, out)

    return fn


def multiple_shooting_fused(model, par, td: TrajectoryData,
                            substeps: int = 10, method: str = "dopri5",
                            interpret: bool = None) -> DiscretizationData:
    """Fused fixed-final-time multiple shooting (the SCvx variant).

    Drop-in for ops.discretization.multiple_shooting(...,
    variable_time=False); identical math, one kernel dispatch for the
    whole (scenario x interval) batch."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    foh = td.interpolated_input
    A, Bm, C, z = _disc_entry(model, substeps, method, foh,
                              bool(interpret))(td.X, td.U, td.t, par)
    return DiscretizationData(A=A, B=Bm, z=z,
                              C=C if foh else None, s=None)


# ---------------------------------------------------------------------------


def _resim_kernel(model, substeps, method, foh,
                  x_ref, u_ref, t_ref, par_ref, tabA_ref, out_ref):
    # flattened single batch in normalized time (see _disc_kernel): the
    # per-row vmap(simulate) form compiled for tens of minutes under
    # Mosaic; this shape is one batched flow per RK stage
    X, U, ts, par = x_ref[:], u_ref[:], t_ref[:], par_ref[:]
    tabA = tabA_ref[:]
    B, K, n = X.shape
    m = U.shape[-1]
    N = B * (K - 1)
    p = par.shape[-1]

    x0 = X[:, :-1].reshape(N, n)
    u0 = U[:, :K - 1].reshape(N, m)
    u1 = (U[:, 1:K] if foh else U[:, :K - 1]).reshape(N, m)
    parN = jnp.broadcast_to(par[:, None, :], (B, K - 1, p)).reshape(N, p)
    dtN = jnp.broadcast_to(ts.reshape(B, 1, 1) / (K - 1),
                           (B, K - 1, 1)).reshape(N, 1)
    fb = jax.vmap(model.flow_map, in_axes=(0, 0, 0))

    def G(V, tau):
        (x,) = V
        u = u0 + tau * (u1 - u0) if foh else u0
        return (dtN * fb(x, u, parN),)

    (x_end,) = _rk_fori(G, (x0,), substeps, tabA, method)
    d = jnp.abs(x_end.reshape(B, K - 1, n) - X[:, 1:])
    out_ref[:] = jnp.sum(jnp.sum(d, axis=2), axis=1, keepdims=True)


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _resim_pallas(model, substeps, method, foh, interpret, X, U, ts, par):
    B, K, n = X.shape
    m = U.shape[-1]
    p = par.shape[-1]
    bs = _bsub_of(B)
    tabA = jnp.asarray(_tableau_arrays(method), X.dtype)
    S = tabA.shape[0]

    def bspec(shape):
        nd = len(shape)
        return pl.BlockSpec((bs,) + shape,
                            lambda i, _nd=nd: (i,) + (0,) * _nd,
                            memory_space=pltpu.VMEM)

    def shared(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        partial(_resim_kernel, model, substeps, method, foh),
        grid=(B // bs,),
        out_shape=jax.ShapeDtypeStruct((B, 1), X.dtype),
        in_specs=[bspec((K, n)), bspec((K, m)), bspec((1,)),
                  bspec((p,)), shared((S, S))],
        out_specs=bspec((1,)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(X, U, ts, par, tabA)


@lru_cache(maxsize=16)
def _resim_entry(model, substeps, method, foh, interpret):
    def base(X, U, t, par):
        def t8(a):
            return jnp.broadcast_to(a[None], (8,) + a.shape)
        J = _resim_pallas(model, substeps, method, foh, interpret,
                          t8(X), t8(U), t8(t[None]), t8(par))
        return J[0, 0]

    fn = jax.custom_batching.custom_vmap(base)

    @fn.def_vmap
    def _rule(axis_size, in_batched, X, U, t, par):
        def bc(leaf, b):
            return leaf if b else jnp.broadcast_to(
                leaf[None], (axis_size,) + leaf.shape)
        Xb = bc(X, in_batched[0])
        Ub = bc(U, in_batched[1])
        tb = bc(t, in_batched[2])[:, None]
        parb = bc(par, in_batched[3])
        J = _resim_pallas(model, substeps, method, foh, interpret,
                          Xb, Ub, tb, parb)
        return J[:, 0], True

    return fn


def nonlinear_defect_cost_fused(model, par, td: TrajectoryData,
                                substeps: int = 12,
                                method: str = "dopri5",
                                interpret: bool = None):
    """Fused J = sum_k ||resim(x_k) - x_{k+1}||_1 (one kernel dispatch)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _resim_entry(model, substeps, method, td.interpolated_input,
                        bool(interpret))(td.X, td.U, td.t, par)
