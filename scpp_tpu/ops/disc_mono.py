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


def _disc_kernel(model, substeps, method, foh,
                 x_ref, u_ref, t_ref, par_ref,
                 A_ref, B_ref, C_ref, z_ref):
    from scpp_tpu.ops.discretization import _multiple_shooting_impl

    X, U, ts, par = x_ref[:], u_ref[:], t_ref[:], par_ref[:]

    def one(Xi, Ui, ti, pari):
        td = TrajectoryData(X=Xi, U=Ui, t=ti)
        dd = _multiple_shooting_impl(model, pari, td, None, substeps,
                                     method, False)
        C = dd.C if foh else jnp.zeros_like(dd.B)
        return dd.A, dd.B, C, dd.z

    A, Bm, C, z = jax.vmap(one)(X, U, ts[:, 0], par)
    A_ref[:] = A
    B_ref[:] = Bm
    C_ref[:] = C
    z_ref[:] = z


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _disc_pallas(model, substeps, method, foh, interpret,
                 X, U, ts, par):
    B, K, n = X.shape
    m = U.shape[-1]
    dtype = X.dtype
    out_shapes = [
        jax.ShapeDtypeStruct((B, K - 1, n, n), dtype),
        jax.ShapeDtypeStruct((B, K - 1, n, m), dtype),
        jax.ShapeDtypeStruct((B, K - 1, n, m), dtype),
        jax.ShapeDtypeStruct((B, K - 1, n), dtype),
    ]
    return pl.pallas_call(
        partial(_disc_kernel, model, substeps, method, foh),
        out_shape=out_shapes,
        in_specs=[_spec()] * 4,
        out_specs=[_spec()] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(X, U, ts, par)


@lru_cache(maxsize=16)
def _disc_entry(model, substeps, method, foh, interpret):
    def base(X, U, t, par):
        A, Bm, C, z = _disc_pallas(model, substeps, method, foh,
                                   interpret, X[None], U[None],
                                   t[None, None], par[None])
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
                  x_ref, u_ref, t_ref, par_ref, out_ref):
    from scpp_tpu.algos.common import interval_resimulation

    X, U, ts, par = x_ref[:], u_ref[:], t_ref[:], par_ref[:]

    def one(Xi, Ui, ti, pari):
        td = TrajectoryData(X=Xi, U=Ui, t=ti)
        x_end = interval_resimulation(model, pari, td, substeps, method)
        return jnp.sum(jnp.sum(jnp.abs(x_end - Xi[1:]), axis=1), axis=0)

    # keepdims-style (B, 1) output: scalars per scenario
    J = jax.vmap(one)(X, U, ts[:, 0], par)
    out_ref[:] = J[:, None]


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _resim_pallas(model, substeps, method, foh, interpret, X, U, ts, par):
    B = X.shape[0]
    return pl.pallas_call(
        partial(_resim_kernel, model, substeps, method, foh),
        out_shape=jax.ShapeDtypeStruct((B, 1), X.dtype),
        in_specs=[_spec()] * 4,
        out_specs=_spec(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(X, U, ts, par)


@lru_cache(maxsize=16)
def _resim_entry(model, substeps, method, foh, interpret):
    def base(X, U, t, par):
        J = _resim_pallas(model, substeps, method, foh, interpret,
                          X[None], U[None], t[None, None], par[None])
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
