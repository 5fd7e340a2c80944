"""Stage-structured Mehrotra IPM: block-tridiagonal KKT on the MXU.

The TPU-native replacement for ECOS on trajectory subproblems
(SURVEY §2 V3): the same Nesterov-Todd predictor-corrector method as
solver/ipm.py, but operating directly on the :class:`StagedProgram`
layout, so that

  - every Jordan-algebra / NT-scaling operation is batched over the K
    stages (the cone layout is identical at every stage by construction),
  - the Gram matrix G' W^-2 G is assembled as K independent (2w+g)^2
    outer products — batched matmuls that ride the MXU,
  - the Newton KKT system is factored by the quasidefinite
    block-tridiagonal (+ arrow) factorization in solver/staged_kkt.py at
    O(K w^3) instead of the dense O((K w)^3) — the ~200x flop gap called
    out by the round-1 review,
  - iterative refinement against the *unregularized* KKT operator
    restores fp32 accuracy lost to the +eps/-delta quasidefinite shift.

Solves the standard form emitted by StagedBuilder:
    min c'x  s.t.  A x + s = b,  s in {0}^me x R+^l x SOC(...)  per stage
                   + a small global row/column block.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from scpp_tpu.solver.cr_pallas import cr_pack, cr_solve_fused
from scpp_tpu.solver.ipm import IPMSettings
from scpp_tpu.solver.staged import StagedProgram
from scpp_tpu.solver.staged_kkt import (
    arrow_factor, arrow_solve, cr_arrow_factor, cr_arrow_solve, cr_factor,
    cr_solve, signed_block_tridiag_factor, signed_block_tridiag_solve,
)

__all__ = ["solve_staged_ipm", "StagedSolverResult"]

# matmul precision is governed by the ambient default_matmul_precision
# context set in solve_staged_ipm from IPMSettings.matmul_precision
_P = None


@struct.dataclass
class StagedSolverResult:
    x_stage: jnp.ndarray       # (K, w)
    x_glob: jnp.ndarray        # (g,)
    obj: jnp.ndarray
    res_pri: jnp.ndarray
    res_dua: jnp.ndarray
    res_gap: jnp.ndarray
    # dual state (original units) for cross-solve warm starting: the
    # consecutive SCvx subproblems differ only in (A,b,h) data, so the
    # previous optimum is an excellent initial point (see ``warm`` in
    # :func:`solve_staged_ipm`)
    y_stage: jnp.ndarray = None   # (K, me)
    y_glob: jnp.ndarray = None    # (meg,)
    z_stage: jnp.ndarray = None   # (K, mc)
    z_glob: jnp.ndarray = None    # (mcg,)

    @property
    def x(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return (self.x_stage, self.x_glob)


class _BatchCones:
    """Jordan-algebra ops on slacks shaped (B, mc) with static layout
    [nonneg (l) | SOC q_1 | SOC q_2 | ...] shared across the batch axis
    (B = K stages, or B = 1 for the global rows).

    All SOC groups are processed in one *padded* tensor (B, S, qmax) —
    rows are the S cones, columns padded with zeros up to the largest cone
    width. Per-cone Python loops (the r03 layout) emitted dozens of tiny
    slice/set kernels per call at ~10 calls per IPM iteration, which was
    the dominant kernel-launch cost of the whole solver at trajectory
    sizes; the padded form is a constant number of fused element-wise ops
    plus one gather/scatter pair regardless of the cone count. Padding is
    exact, not approximate: every reduction only ever *adds zeros*, so
    results match the loop form to roundoff."""

    def __init__(self, B: int, l: int, soc_sizes: Tuple[int, ...]):
        self.B = B
        self.l = l
        self.soc_sizes = tuple(soc_sizes)
        self.mc = l + sum(soc_sizes)
        offs = []
        off = l
        for q in soc_sizes:
            offs.append(off)
            off += q
        self.soc_offs = tuple(offs)
        self.deg = B * (l + len(soc_sizes))
        self.S = len(soc_sizes)
        self.qmax = max(soc_sizes) if soc_sizes else 0
        # gather map (S, qmax) into the padded cone vector [0, mc]; slot mc
        # is an all-zero pad column appended by _gather
        idx = np.full((self.S, self.qmax), self.mc, np.int32)
        for i, (o, q) in enumerate(zip(self.soc_offs, self.soc_sizes)):
            idx[i, :q] = o + np.arange(q)
        self.soc_idx = idx
        # J = diag(1, -1, ..., -1) as a padded row vector (reflection)
        self._Jrow = None
        if self.S:
            self._Jrow = np.concatenate(
                [[1.0], -np.ones(self.qmax - 1)]).astype(np.float64)

    def e(self, dtype):
        v = np.zeros((self.B, self.mc))
        v[:, :self.l] = 1.0
        for o in self.soc_offs:
            v[:, o] = 1.0
        return jnp.asarray(v, dtype)

    def _gather(self, u):
        """(B, mc) -> (B, S, qmax) padded SOC blocks (pad slots read 0)."""
        u_pad = jnp.concatenate(
            [u, jnp.zeros((u.shape[0], 1), u.dtype)], axis=1)
        return u_pad[:, self.soc_idx]

    def _scatter(self, out, vals):
        """Write padded SOC block values ``vals`` (B, S, qmax) into the
        cone-vector positions of ``out`` (B, mc); pad slots land in a
        sacrificial extra column and are sliced off."""
        out = jnp.concatenate(
            [out, jnp.zeros((out.shape[0], 1), out.dtype)], axis=1)
        out = out.at[:, self.soc_idx].set(vals)
        return out[:, :self.mc]

    def mul(self, u, v):
        if self.mc == 0:
            return jnp.zeros_like(u)
        out = jnp.zeros_like(u)
        if self.l:
            out = out.at[:, :self.l].set(u[:, :self.l] * v[:, :self.l])
        if self.S:
            ub, vb = self._gather(u), self._gather(v)
            head = jnp.sum(ub * vb, axis=2, keepdims=True)
            tail = ub[:, :, :1] * vb[:, :, 1:] + vb[:, :, :1] * ub[:, :, 1:]
            out = self._scatter(out, jnp.concatenate([head, tail], axis=2))
        return out

    def inv(self, u):
        if self.mc == 0:
            return jnp.zeros_like(u)
        out = jnp.zeros_like(u)
        if self.l:
            out = out.at[:, :self.l].set(1.0 / u[:, :self.l])
        if self.S:
            ub = self._gather(u)
            det = ub[:, :, 0] ** 2 - jnp.sum(ub[:, :, 1:] ** 2, axis=2)
            Ju = jnp.concatenate([ub[:, :, :1], -ub[:, :, 1:]], axis=2)
            out = self._scatter(out, Ju / det[:, :, None])
        return out

    def min_shift(self, u):
        parts = [jnp.asarray(-jnp.inf, u.dtype)]
        if self.l:
            parts.append(jnp.max(-u[:, :self.l]))
        if self.S:
            ub = self._gather(u)
            parts.append(jnp.max(
                jnp.sqrt(jnp.sum(ub[:, :, 1:] ** 2, axis=2)) - ub[:, :, 0]))
        return jnp.max(jnp.stack(parts))

    def max_step(self, u, du):
        big = jnp.asarray(1e20, u.dtype)
        alphas = [big]
        if self.l:
            un, dn = u[:, :self.l], du[:, :self.l]
            a = jnp.where(dn < 0, -un / jnp.where(dn < 0, dn, -1.0), big)
            alphas.append(jnp.min(a))
        if self.S:
            ub, db = self._gather(u), self._gather(du)
            a2 = db[:, :, 0] ** 2 - jnp.sum(db[:, :, 1:] ** 2, axis=2)
            b2 = (ub[:, :, 0] * db[:, :, 0]
                  - jnp.sum(ub[:, :, 1:] * db[:, :, 1:], axis=2))
            c2 = ub[:, :, 0] ** 2 - jnp.sum(ub[:, :, 1:] ** 2, axis=2)
            disc = b2 ** 2 - a2 * c2
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            root_neg_a = (b2 + sq) / jnp.maximum(-a2, 1e-30)
            root_pos_a = jnp.where(
                (disc > 0) & (b2 < 0),
                c2 / jnp.maximum(-b2 + sq, 1e-30), big)
            lin = jnp.where(b2 < 0,
                            -c2 / (2.0 * jnp.where(b2 < 0, b2, -1.0)), big)
            a_soc = jnp.where(a2 < -1e-30, root_neg_a,
                              jnp.where(a2 > 1e-30, root_pos_a, lin))
            head_cap = jnp.where(
                db[:, :, 0] < 0,
                -ub[:, :, 0] / jnp.where(db[:, :, 0] < 0, db[:, :, 0], -1.0),
                big)
            alphas.append(jnp.min(jnp.minimum(a_soc, head_cap)))
        return jnp.min(jnp.stack(alphas))

    def nt_scaling(self, s, z, compute_dtype=None):
        """NT scaling point; returns (rep, lam) with ``rep`` holding DENSE
        per-stage block-diagonal W / W^-1 / W^-2 matrices (B, mc, mc),
        assembled once per iteration so every apply is a single batched
        einsum that rides the MXU.

        ``compute_dtype``: optional higher precision for the scaling-point
        arithmetic itself (outputs are cast back to the input dtype). The
        SOC scaling point needs det(s) = s0^2 - ||s_tail||^2, a cancelling
        difference that loses all significance in fp32 once a cone is
        within ~sqrt(eps32) of its boundary — which is exactly where the
        central path walks as mu -> 0."""
        out_dtype = s.dtype
        if compute_dtype is not None and compute_dtype != s.dtype:
            s = s.astype(compute_dtype)
            z = z.astype(compute_dtype)
        dtype = s.dtype
        lam = jnp.zeros_like(s)
        Wd = jnp.zeros((self.B, self.mc + 1, self.mc + 1), dtype)
        Wi = jnp.zeros_like(Wd)
        Wi2 = jnp.zeros_like(Wd)
        if self.l:
            sn, zn = s[:, :self.l], z[:, :self.l]
            dvec = jnp.sqrt(sn / zn)
            il = np.arange(self.l)
            Wd = Wd.at[:, il, il].set(dvec)
            Wi = Wi.at[:, il, il].set(1.0 / dvec)
            Wi2 = Wi2.at[:, il, il].set(1.0 / dvec ** 2)
            lam = lam.at[:, :self.l].set(jnp.sqrt(sn * zn))
        if self.S:
            sb = self._gather(s)                              # (B, S, q)
            zb = self._gather(z)
            Jrow = jnp.asarray(self._Jrow, dtype)             # (q,)
            Jmat = jnp.diag(Jrow)                             # (q, q)
            det_s = jnp.maximum(
                sb[:, :, 0] ** 2 - jnp.sum(sb[:, :, 1:] ** 2, 2), 1e-30)
            det_z = jnp.maximum(
                zb[:, :, 0] ** 2 - jnp.sum(zb[:, :, 1:] ** 2, 2), 1e-30)
            sbar = sb / jnp.sqrt(det_s)[:, :, None]
            zbar = zb / jnp.sqrt(det_z)[:, :, None]
            gamma = jnp.sqrt(jnp.maximum(
                (1.0 + jnp.sum(sbar * zbar, 2)) / 2.0, 1e-30))
            wbar = (sbar + zbar * Jrow) / (2.0 * gamma[:, :, None])
            eta = (det_s / det_z) ** 0.25
            wv = eta[:, :, None] * wbar
            detw = jnp.maximum(
                wv[:, :, 0] ** 2 - jnp.sum(wv[:, :, 1:] ** 2, 2), 1e-30)
            sqrt_detw = jnp.sqrt(detw)
            e0 = jnp.zeros((self.qmax,), dtype).at[0].set(1.0)
            u = (wv + sqrt_detw[:, :, None] * e0) / jnp.sqrt(
                2.0 * (wv[:, :, 0] + sqrt_detw))[:, :, None]
            detu = sqrt_detw
            Wb = (2.0 * u[:, :, :, None] * u[:, :, None, :]
                  - detu[:, :, None, None] * Jmat)
            uinv = (u * Jrow) / detu[:, :, None]
            Wib = (2.0 * uinv[:, :, :, None] * uinv[:, :, None, :]
                   - (1.0 / detu)[:, :, None, None] * Jmat)
            # W^-2 blockwise (the dense mc x mc product is redundant work:
            # W is block-diagonal, so squaring the small blocks suffices)
            Wi2b = jnp.einsum("bsij,bsjk->bsik", Wib, Wib, precision=_P)
            lam_soc = jnp.einsum("bsij,bsj->bsi", Wb, zb, precision=_P)
            lam = self._scatter(lam, lam_soc)
            ridx = self.soc_idx[:, :, None]                   # (S, q, 1)
            cidx = self.soc_idx[:, None, :]                   # (S, 1, q)
            Wd = Wd.at[:, ridx, cidx].set(Wb)
            Wi = Wi.at[:, ridx, cidx].set(Wib)
            Wi2 = Wi2.at[:, ridx, cidx].set(Wi2b)
        rep = {"W": Wd[:, :self.mc, :self.mc].astype(out_dtype),
               "Winv": Wi[:, :self.mc, :self.mc].astype(out_dtype),
               "Winv2": Wi2[:, :self.mc, :self.mc].astype(out_dtype)}
        return rep, lam.astype(out_dtype)

    def identity_rep(self, dtype):
        I = jnp.broadcast_to(jnp.eye(self.mc, dtype=dtype),
                             (self.B, self.mc, self.mc))
        return {"W": I, "Winv": I, "Winv2": I}

    def apply_W(self, rep, v):
        return jnp.einsum("bij,bj->bi", rep["W"], v, precision=_P)

    def apply_Winv(self, rep, v):
        return jnp.einsum("bij,bj->bi", rep["Winv"], v, precision=_P)

    def apply_Winv2(self, rep, v):
        """W^-2 v in one batched matmul (replaces Winv(Winv(v)))."""
        return jnp.einsum("bij,bj->bi", rep["Winv2"], v, precision=_P)

    def apply_Winv_rows(self, rep, M):
        """W^-1 @ M rowwise; M: (B, mc, C)."""
        return jnp.einsum("bij,bjc->bic", rep["Winv"], M, precision=_P)


# ---------------------------------------------------------------------------


def _staged_ruiz(prog: StagedProgram, iters: int):
    """Ruiz equilibration on the staged layout.

    Column scales: E_st (K, w), E_g (g,); row scales: d_eq (K, me),
    d_c (K, mc) (uniform within each SOC block), d_geq (meg,), d_cg (mcg,).
    """
    K, w, g = prog.K, prog.w, prog.g
    dtype = prog.A_eq.dtype
    A_eq, G = prog.A_eq, prog.G
    A_geq, G_g = prog.A_geq, prog.G_g

    E_st = jnp.ones((K, w), dtype)
    E_g = jnp.ones((g,), dtype)
    d_eq = jnp.ones(A_eq.shape[:2], dtype)
    d_c = jnp.ones(G.shape[:2], dtype)
    d_geq = jnp.ones(A_geq.shape[:1], dtype)
    d_cg = jnp.ones(G_g.shape[:1], dtype)

    def colscale_cat(E_st, E_g):
        E_next = jnp.concatenate([E_st[1:], jnp.ones((1, w), dtype)], 0)
        Eg = jnp.broadcast_to(E_g, (K, g))
        return jnp.concatenate([E_st, E_next, Eg], axis=1)   # (K, 2w+g)

    def soc_uniform(r):
        """Make SOC-block row scales uniform (max over the block)."""
        out = r
        for o, q in zip(_soc_offs(prog.l, prog.soc_sizes),
                        prog.soc_sizes):
            m = jnp.max(r[:, o:o + q], axis=1, keepdims=True)
            out = out.at[:, o:o + q].set(jnp.broadcast_to(m, (K, q)))
        return out

    def soc_uniform_g(r):
        out = r
        for o, q in zip(_soc_offs(prog.l_g, prog.soc_sizes_g),
                        prog.soc_sizes_g):
            m = jnp.max(r[o:o + q])
            out = out.at[o:o + q].set(m)
        return out

    def sweep(_, scales):
        E_st, E_g, d_eq, d_c, d_geq, d_cg = scales
        Ecat = colscale_cat(E_st, E_g)
        Aeq_s = A_eq * d_eq[:, :, None] * Ecat[:, None, :]
        G_s = G * d_c[:, :, None] * Ecat[:, None, :]
        Ageq_s = A_geq * d_geq[:, None] * E_g[None, :]
        Gg_s = G_g * d_cg[:, None] * E_g[None, :]

        # row update
        r_eq = jnp.max(jnp.abs(Aeq_s), axis=2)
        r_c = soc_uniform(jnp.max(jnp.abs(G_s), axis=2))
        r_geq = jnp.max(jnp.abs(Ageq_s), axis=1) if A_geq.shape[0] else d_geq
        r_cg = soc_uniform_g(jnp.max(jnp.abs(Gg_s), axis=1)) \
            if G_g.shape[0] else d_cg
        # all-zero rows (padded / masked-off families) stay unscaled —
        # otherwise each sweep multiplies their scale by 1e6 and the rhs
        # blows up to ~1e60 after 10 sweeps
        def rowscale(d, r):
            return jnp.where(r < 1e-12, d,
                             d / jnp.sqrt(jnp.maximum(r, 1e-12)))

        d_eq = rowscale(d_eq, r_eq)
        d_c = rowscale(d_c, r_c)
        if A_geq.shape[0]:
            d_geq = rowscale(d_geq, r_geq)
        if G_g.shape[0]:
            d_cg = rowscale(d_cg, r_cg)

        # column update (with refreshed row scales)
        Ecat = colscale_cat(E_st, E_g)
        Aeq_s = A_eq * d_eq[:, :, None] * Ecat[:, None, :]
        G_s = G * d_c[:, :, None] * Ecat[:, None, :]
        both = jnp.concatenate([Aeq_s, G_s], axis=1)     # (K, me+mc, C)
        colmax = jnp.max(jnp.abs(both), axis=1)          # (K, 2w+g)
        cm_cur = colmax[:, :w]
        cm_next = jnp.concatenate(
            [jnp.zeros((1, w), dtype), colmax[:-1, w:2 * w]], 0)
        cmax_st = jnp.maximum(cm_cur, cm_next)
        cmax_g = jnp.max(colmax[:, 2 * w:], axis=0) if g else E_g
        if g and (A_geq.shape[0] or G_g.shape[0]):
            Ageq_s = A_geq * d_geq[:, None] * E_g[None, :]
            Gg_s = G_g * d_cg[:, None] * E_g[None, :]
            gboth = jnp.concatenate([Ageq_s, Gg_s], axis=0)
            if gboth.shape[0]:
                cmax_g = jnp.maximum(cmax_g,
                                     jnp.max(jnp.abs(gboth), axis=0))
        # same guard for empty columns (e.g. the virtual control's padded
        # copy at the last stage appears in no row at all)
        E_st = jnp.where(cmax_st < 1e-12, E_st,
                         E_st / jnp.sqrt(jnp.maximum(cmax_st, 1e-12)))
        if g:
            E_g = jnp.where(cmax_g < 1e-12, E_g,
                            E_g / jnp.sqrt(jnp.maximum(cmax_g, 1e-12)))
        return (E_st, E_g, d_eq, d_c, d_geq, d_cg)

    # fori_loop, not a Python loop: sweeps are shape-static, and unrolling
    # 10 of them was a measurable slice of the XLA compile budget
    return jax.lax.fori_loop(
        0, iters, sweep, (E_st, E_g, d_eq, d_c, d_geq, d_cg))


def _soc_offs(l, soc_sizes):
    offs = []
    off = l
    for q in soc_sizes:
        offs.append(off)
        off += q
    return tuple(offs)


# ---------------------------------------------------------------------------


def solve_staged_ipm(prog: StagedProgram,
                     settings: IPMSettings = IPMSettings(),
                     warm: StagedSolverResult = None,
                     warm_ok=False) -> StagedSolverResult:
    """Solve a staged conic program.

    ``warm``: a previous :class:`StagedSolverResult` on a same-structured
    program (e.g. the preceding SCvx subproblem — only the numeric data
    differs). Its primal is used as the initial x (slacks re-derived as
    h - Gx against the NEW data), its duals as the initial (y, z), each
    shifted into the cone interior by ``settings.warm_kappa`` instead of
    the cold init's unit margin. ``warm_ok`` (traced bool) selects warm
    vs cold per call so a vmapped batch can mix both (first SCvx step,
    or a failed previous solve).

    ``settings.monolith`` routes supported shapes (gm == 0 trajectory
    subproblems, full-precision lanes) to the fused whole-solve Pallas
    kernel (solver/ipm_mono.py); everything else stays here."""
    if settings.monolith:
        from scpp_tpu.solver.ipm_mono import (mono_supported,
                                              solve_staged_ipm_mono)
        if mono_supported(prog, settings):
            return solve_staged_ipm_mono(prog, settings, warm, warm_ok)
    return _solve_unfused(prog, settings, warm, warm_ok)


@partial(jax.jit, static_argnums=(1,))
def _solve_unfused(prog: StagedProgram, settings: IPMSettings,
                   warm: StagedSolverResult = None,
                   warm_ok=False) -> StagedSolverResult:
    with jax.default_matmul_precision(settings.matmul_precision):
        return _solve_impl(prog, settings, warm, warm_ok)


def _solve_impl(prog: StagedProgram, settings: IPMSettings,
                warm: StagedSolverResult = None,
                warm_ok=False) -> StagedSolverResult:
    K, w, g = prog.K, prog.w, prog.g
    me = prog.me
    meg = prog.A_geq.shape[0]
    dtype = prog.A_eq.dtype
    gm = g + meg                        # global KKT block width
    Wp = w + me                         # stage KKT block width

    # ---- equilibration ----
    E_st, E_g, d_eq, d_c, d_geq, d_cg = _staged_ruiz(prog, settings.ruiz_iters)
    Ecat = jnp.concatenate([
        E_st,
        jnp.concatenate([E_st[1:], jnp.ones((1, w), dtype)], 0),
        jnp.broadcast_to(E_g, (K, g))], axis=1)
    A_eq = prog.A_eq * d_eq[:, :, None] * Ecat[:, None, :]
    G = prog.G * d_c[:, :, None] * Ecat[:, None, :]
    b_eq = prog.b_eq * d_eq
    h = prog.h * d_c
    A_geq = prog.A_geq * d_geq[:, None] * E_g[None, :]
    b_geq = prog.b_geq * d_geq
    G_g = prog.G_g * d_cg[:, None] * E_g[None, :]
    h_g = prog.h_g * d_cg
    c_st = prog.c_stage * E_st
    c_g = prog.c_glob * E_g

    # cost/rhs normalization (the part of equilibration Ruiz cannot see):
    # the virtual-control weight puts ~1e3 entries in c, so without this
    # the dual initialization starts at |z| ~ 1e3, mu_0 ~ 1e3 and the
    # predictor-corrector spends its budget scaling down — and stalls.
    # x is invariant; (y, z, s-complement) scale back by c_scale below.
    # MEDIAN of the nonzero |c|, not the max: Ruiz column scales can blow
    # a single cost entry up 1e3x (e.g. the nu_abs column of a state whose
    # dynamics row carries a 1/J_z ~ 1e6 coefficient), and normalizing by
    # that outlier crushes the typical scaled objective to ~1e-5 — which
    # silently turned the relative-gap test below into "accept anything"
    cabs = jnp.concatenate([jnp.abs(c_st).ravel(), jnp.abs(c_g).ravel()])
    c_scale = jnp.maximum(
        1.0, jnp.nanmedian(jnp.where(cabs > 0, cabs, jnp.nan)))
    c_scale = jnp.where(jnp.isfinite(c_scale), c_scale, 1.0)
    b_scale = jnp.maximum(1.0, jnp.sqrt(
        jnp.sum(b_eq ** 2) + jnp.sum(b_geq ** 2)
        + jnp.sum(h ** 2) + jnp.sum(h_g ** 2)))
    c_st = c_st / c_scale
    c_g = c_g / c_scale
    b_eq = b_eq / b_scale
    h = h / b_scale
    b_geq = b_geq / b_scale
    h_g = h_g / b_scale

    cones = _BatchCones(K, prog.l, prog.soc_sizes)
    cones_g = _BatchCones(1, prog.l_g, prog.soc_sizes_g)
    mc, mcg = cones.mc, cones_g.mc
    nu_deg = max(cones.deg + cones_g.deg, 1)
    e_st = cones.e(dtype)
    e_g = cones_g.e(dtype)[0]

    eps = settings.eps_reg
    delta = settings.eps_reg
    rho = settings.rho_lift
    sqrho = jnp.sqrt(jnp.asarray(rho, dtype))

    # ---- staged matvecs ----

    def cat_x(x_st, x_g):
        x_next = jnp.concatenate([x_st[1:], jnp.zeros((1, w), dtype)], 0)
        return jnp.concatenate(
            [x_st, x_next, jnp.broadcast_to(x_g, (K, g))], axis=1)

    def uncat(xc):
        """Adjoint of cat_x: (K, 2w+g) -> ((K, w), (g,))."""
        x_st = xc[:, :w].at[1:].add(xc[:-1, w:2 * w])
        x_g = jnp.sum(xc[:, 2 * w:], axis=0)
        return x_st, x_g

    # A_eq and G stacked once: the IPM's matvec chains almost always need
    # both, and one (K, me+mc, C) einsum is half the kernel passes of two
    M_st = jnp.concatenate([A_eq, G], axis=1)

    def AG_mv(x_st, x_g):
        """Returns (A x, G x) for the stage rows in ONE einsum + globals."""
        xc = cat_x(x_st, x_g)
        both = jnp.einsum("kmc,kc->km", M_st, xc, precision=_P)
        y_g = A_geq @ x_g if meg else jnp.zeros((0,), dtype)
        z_g = G_g @ x_g if mcg else jnp.zeros((0,), dtype)
        return (both[:, :me], y_g), (both[:, me:], z_g)

    def AG_rmv(y_st, y_g, z_st, z_g):
        """A' y + G' z in ONE stacked einsum."""
        vc = jnp.concatenate([y_st, z_st], axis=1)
        xc = jnp.einsum("kmc,km->kc", M_st, vc, precision=_P)
        x_st, x_g = uncat(xc)
        if meg:
            x_g = x_g + A_geq.T @ y_g
        if mcg:
            x_g = x_g + G_g.T @ z_g
        return x_st, x_g

    def A_mv(x_st, x_g):
        xc = cat_x(x_st, x_g)
        y_st = jnp.einsum("kmc,kc->km", A_eq, xc, precision=_P)
        y_g = A_geq @ x_g if meg else jnp.zeros((0,), dtype)
        return y_st, y_g

    def A_rmv(y_st, y_g):
        xc = jnp.einsum("kmc,km->kc", A_eq, y_st, precision=_P)
        x_st, x_g = uncat(xc)
        if meg:
            x_g = x_g + A_geq.T @ y_g
        return x_st, x_g

    def G_mv(x_st, x_g):
        xc = cat_x(x_st, x_g)
        z_st = jnp.einsum("kmc,kc->km", G, xc, precision=_P)
        z_g = G_g @ x_g if mcg else jnp.zeros((0,), dtype)
        return z_st, z_g

    def G_rmv(z_st, z_g):
        xc = jnp.einsum("kmc,km->kc", G, z_st, precision=_P)
        x_st, x_g = uncat(xc)
        if mcg:
            x_g = x_g + G_g.T @ z_g
        return x_st, x_g

    def dot(a, b):
        return sum(jnp.vdot(x, y) for x, y in zip(a, b))

    # Mixed-precision mode (IPMSettings.refine_f64): the ITERATES and all
    # small vector/cone algebra (NT scaling, residuals, step lengths, the
    # Mehrotra corrector assembly, refinement residuals) run in float64,
    # while the O(K w^3) KKT factorization and triangular solves — the
    # dominant cost — stay in the working fp32. Rationale (measured on the
    # stock Rocket2D SC subproblem): pure-fp32 floors the duality gap at
    # ~2.6e-2 because near mu ~ 3e-7 the cancelling cone determinants
    # det(s) = s0^2 - ||s_tail||^2 and the mu-level corrector algebra lose
    # all significance, the predictor NaNs, and the solver freezes; fp64
    # algebra + fp32-factor-preconditioned refinement reaches f64-grade
    # gaps at fp32-factor cost. JAX type promotion does the heavy lifting:
    # with f64 iterates, the fp32 operator matvecs promote to f64.
    # kkt_dtype="float64" implies f64 compute as well (advisor r04): a
    # f64 factor returns f64 corrections, which would promote the loop
    # iterates mid-carry and crash the while_loop type check if the
    # carry had been built in fp32.
    mixed_f64 = (settings.refine_f64 or settings.kkt_dtype == "float64") \
        and dtype != jnp.float64
    compute_dtype = jnp.float64 if mixed_f64 else dtype
    if mixed_f64 and not jax.config.jax_enable_x64:
        # without x64, every astype(float64) silently canonicalizes to
        # fp32 and the "accuracy lane" would deliver plain fp32 results
        import warnings
        warnings.warn(
            "IPMSettings.refine_f64/kkt_dtype='float64' requested but "
            "jax_enable_x64 is off: f64 is canonicalized away and the "
            "accuracy lane degrades to plain fp32", stacklevel=2)

    def _lift(t):
        return jax.tree_util.tree_map(
            lambda a: a.astype(compute_dtype), t)

    # ---- KKT factor / solve ----

    # the factorization dtype: the working dtype by default; float64 when
    # kkt_dtype="float64" (the accuracy lane — fp32 factorization floors
    # the achievable duality gap at ~sqrt(eps32) ~ 1e-2 because the
    # KKT condition number grows like 1/mu; a f64 factor removes the
    # floor at the cost of emulated-f64 matmuls on TPU)
    fdtype = (jnp.float64 if settings.kkt_dtype == "float64"
              and dtype != jnp.float64 else dtype)
    A_eq_f = A_eq.astype(fdtype)
    A_geq_f = A_geq.astype(fdtype)
    # fused Pallas CR solve: TPU needs an fp32 factor (no f64 Mosaic);
    # off-TPU the interpreter path exercises the same code in tests
    use_fused = (settings.kkt_fused and settings.kkt == "cr" and gm == 0
                 and (fdtype == jnp.float32
                      or jax.default_backend() != "tpu"))

    def kkt_factor(rep, rep_g):
        # the factorization is a *preconditioner*: refinement in kkt_solve
        # corrects against the exact operator at full precision, so the
        # Gram assembly and the cyclic-reduction Schur algebra — the
        # solver's dominant matmul passes — may run at kkt_precision
        # (bf16 on the fast path). Only the Cholesky pivots need full
        # precision; signed_cholesky pins that internally. The scaling rep
        # is cast to the factor dtype at this boundary.
        rep = {k: v.astype(fdtype) for k, v in rep.items()}
        rep_g = {k: v.astype(fdtype) for k, v in rep_g.items()}
        with jax.default_matmul_precision(settings.kkt_precision):
            return _kkt_factor_impl(rep, rep_g)

    def _kkt_factor_impl(rep, rep_g):
        # H = G' W^-2 G + rho A'A: the rho-lift keeps the primal pivots
        # positive-definite along directions whose cone rows go inactive
        # (W^-2 -> 0 there as mu -> 0), exactly as in the dense backend
        Gw = cones.apply_Winv_rows(rep, G.astype(fdtype))       # (K, mc, C)
        Gw = jnp.concatenate([Gw, sqrho.astype(fdtype) * A_eq_f], axis=1)
        Gam = jnp.einsum("kmc,kmd->kcd", Gw, Gw, precision=_P)  # (K, C, C)
        Hxx = Gam[:, :w, :w]
        Hnn = Gam[:, w:2 * w, w:2 * w]
        Hxn = Gam[:, w:2 * w, :w]

        I_w = jnp.eye(w, dtype=fdtype)
        Dxx = eps * I_w + Hxx
        Dxx = Dxx.at[1:].add(Hnn[:-1])
        Dxy = jnp.swapaxes(A_eq_f[:, :, :w], 1, 2)              # (K, w, me)
        Dyy = jnp.broadcast_to(-delta * jnp.eye(me, dtype=fdtype),
                               (K, me, me))
        D = jnp.concatenate([
            jnp.concatenate([Dxx, Dxy], axis=2),
            jnp.concatenate([jnp.swapaxes(Dxy, 1, 2), Dyy], axis=2)],
            axis=1)                                             # (K, Wp, Wp)

        Oxx = Hxn[:-1]                                          # (K-1, w, w)
        Oxy = jnp.swapaxes(A_eq_f[:-1, :, w:2 * w], 1, 2)       # (K-1, w, me)
        O = jnp.concatenate([
            jnp.concatenate([Oxx, Oxy], axis=2),
            jnp.zeros((K - 1, me, Wp), fdtype)], axis=1)

        if gm == 0:
            if settings.kkt == "cr":
                fact = cr_factor(D, O, w)
                if use_fused:
                    packed, p_sig = cr_pack(fact, K)
                    return ("cr_fused", packed, p_sig)
                return ("cr",) + fact
            L_diag, C_sub = signed_block_tridiag_factor(D, O, w)
            return ("banded", L_diag, C_sub)

        Hxg = Gam[:, :w, 2 * w:]
        Hng = Gam[:, w:2 * w, 2 * w:]
        Bxg = Hxg.at[1:].add(Hng[:-1])                          # (K, w, g)
        Byg = A_eq_f[:, :, 2 * w:]                              # (K, me, g)
        Bg = jnp.concatenate([
            jnp.concatenate([Bxg, jnp.zeros((K, w, meg), fdtype)], axis=2),
            jnp.concatenate([Byg, jnp.zeros((K, me, meg), fdtype)], axis=2)],
            axis=1)                                             # (K, Wp, gm)

        Hgg = jnp.sum(Gam[:, 2 * w:, 2 * w:], axis=0)
        if mcg:
            Ggw = cones_g.apply_Winv_rows(rep_g, G_g.astype(fdtype)[None])[0]
            Hgg = Hgg + Ggw.T @ Ggw
        if meg:
            Hgg = Hgg + rho * (A_geq_f.T @ A_geq_f)
        Cg_xx = Hgg + eps * jnp.eye(g, dtype=fdtype)
        Cg = jnp.concatenate([
            jnp.concatenate([Cg_xx, A_geq_f.T], axis=1),
            jnp.concatenate([A_geq_f, -delta * jnp.eye(meg, dtype=fdtype)],
                            axis=1)], axis=0)
        if settings.kkt == "cr":
            return ("cr_arrow",) + cr_arrow_factor(D, O, Bg, Cg, w, g)
        fact = arrow_factor(D, O, Bg, Cg, w, g)
        return ("arrow",) + fact

    def kkt_raw_solve(fact, r_x, r_y, precision=None):
        """One regularized-KKT solve; r_x = ((K,w),(g,)), r_y likewise.

        The back-substitution sweeps run at ``kkt_precision`` (bf16 on the
        fast path): with the factorization itself at full precision, sweep
        roundoff is a small *linear* error that the refinement sweeps in
        kkt_solve contract against the exact operator — classical
        mixed-precision iterative refinement, ~2.5x on the whole solver at
        flagship shapes. Callers that skip refinement (the inits) pass an
        explicit full ``precision``."""
        with jax.default_matmul_precision(precision
                                          or settings.kkt_precision):
            return _kkt_raw_solve_impl(fact, r_x, r_y)

    def _kkt_raw_solve_impl(fact, r_x, r_y):
        # the raw solve runs against the factor-dtype triangular factors —
        # cast residuals at this boundary (f64 residuals from mixed_f64
        # drop to fp32 when the factor is fp32); corrections promote back
        # up in the caller's accumulation
        rx_st, rx_g = (r_x[0].astype(fdtype), r_x[1].astype(fdtype))
        ry_st, ry_g = (r_y[0].astype(fdtype), r_y[1].astype(fdtype))
        b_stage = jnp.concatenate([rx_st, ry_st], axis=1)       # (K, Wp)
        if fact[0] == "cr_fused":
            sol = cr_solve_fused(fact[1], b_stage, fact[2],
                                 jax.default_backend() != "tpu")
            dx_st, dy_st = sol[:, :w], sol[:, w:]
            return (dx_st, jnp.zeros((g,), fdtype)), \
                   (dy_st, jnp.zeros((meg,), fdtype))
        if fact[0] in ("banded", "cr"):
            if fact[0] == "cr":
                sol = cr_solve(fact[1:], b_stage)
            else:
                sol = signed_block_tridiag_solve(fact[1], fact[2], w,
                                                 b_stage)
            dx_st, dy_st = sol[:, :w], sol[:, w:]
            return (dx_st, jnp.zeros((g,), fdtype)), \
                   (dy_st, jnp.zeros((meg,), fdtype))
        b_glob = jnp.concatenate([rx_g, ry_g])
        if fact[0] == "cr_arrow":
            sol_st, sol_g = cr_arrow_solve(fact[1:], b_stage, b_glob)
        else:
            sol_st, sol_g = arrow_solve(fact[1:], b_stage, b_glob)
        return (sol_st[:, :w], sol_g[:g]), (sol_st[:, w:], sol_g[g:])

    def kkt_solve(fact, rep, rep_g, f1, f2, rzWd, refine_steps=None,
                  raw_precision=None):
        """Solve  H dx + A' dy = f1 - G' W^-2 (rz + W d),  A dx = f2,
        recover dz = W^-2 (G dx) + u3; refined against the exact
        (unregularized) operator. ``raw_precision`` overrides the
        back-substitution precision (used by the unrefined init solves)."""
        if refine_steps is None:
            refine_steps = settings.refine_steps
        u3_st = cones.apply_Winv2(rep, rzWd[0])
        u3_g = cones_g.apply_Winv2(rep_g, rzWd[1][None])[0]
        # A'(rho f2) - G' u3 in one stacked einsum
        mf_st, mf_g = AG_rmv(rho * f2[0], rho * f2[1], -u3_st, -u3_g)
        r1 = (f1[0] + mf_st, f1[1] + mf_g)

        dx, dy = kkt_raw_solve(fact, r1, f2, raw_precision)
        # under mixed_f64 the refinement residuals and the accumulated
        # corrections run in f64 (r1/f2/rep are already f64 from the f64
        # iterates; promotion lifts the operator matvecs)
        dx, dy = _lift(dx), _lift(dy)
        for _ in range(refine_steps):
            # exact residuals of the lifted system:
            # H_lift dx = G' W^-2 G dx + rho A'A dx
            (ax_st, ax_g), (gx_st, gx_g) = AG_mv(*dx)
            wx_st = cones.apply_Winv2(rep, gx_st)
            wx_g = cones_g.apply_Winv2(rep_g, gx_g[None])[0]
            # G' W^-2 G dx + A'(rho A dx + dy) fused
            mx_st, mx_g = AG_rmv(rho * ax_st + dy[0], rho * ax_g + dy[1],
                                 wx_st, wx_g)
            res1 = (r1[0] - mx_st, r1[1] - mx_g)
            res2 = (f2[0] - ax_st, f2[1] - ax_g)
            cx, cy = kkt_raw_solve(fact, res1, res2, raw_precision)
            dx = (dx[0] + cx[0], dx[1] + cx[1])
            dy = (dy[0] + cy[0], dy[1] + cy[1])

        gx_st, gx_g = G_mv(*dx)
        dz_st = cones.apply_Winv2(rep, gx_st) + u3_st
        dz_g = cones_g.apply_Winv2(rep_g, gx_g[None])[0] + u3_g
        return dx, dy, (dz_st, dz_g)

    # ---- initialization (CVXOPT conelp style) ----
    rep0 = cones.identity_rep(dtype)
    rep0_g = cones_g.identity_rep(dtype)
    fact0 = kkt_factor(rep0, rep0_g)
    # init solves need an interior point, not refined accuracy — skipping
    # refinement here halves the unrolled (outside-the-scan) KKT HLO. On
    # the mixed-precision path fact0 itself was factored under
    # kkt_precision, so one refinement sweep keeps the starting point from
    # inheriting bf16 factorization error (advisor r03).
    init_refine = 0 if settings.kkt_precision == "highest" else 1
    zero_x = (jnp.zeros((K, w), dtype), jnp.zeros((g,), dtype))
    (x0, x0g), _, _ = kkt_solve(fact0, rep0, rep0_g,
                                zero_x, (b_eq, b_geq),
                                (-h, -h_g), refine_steps=init_refine,
                                raw_precision=settings.matmul_precision)
    if warm is not None:
        # warm primal, scaled into this problem's equilibrated space
        # (x_orig = E x^ b_scale); slacks re-derived below as h - G x
        # against the NEW data so they are automatically consistent
        kappa = jnp.asarray(settings.warm_kappa, dtype)
        x0 = jnp.where(warm_ok, warm.x_stage / (E_st * b_scale), x0)
        if g:
            x0g = jnp.where(warm_ok, warm.x_glob / (E_g * b_scale), x0g)
    s_cand = (h - G_mv(x0, x0g)[0], h_g - G_mv(x0, x0g)[1])
    t_p = jnp.maximum(cones.min_shift(s_cand[0]),
                      cones_g.min_shift(s_cand[1][None]))
    shift_p = jnp.where(t_p < -1e-8, 0.0, t_p + 1.0)
    if warm is not None:
        # warm margin: shift only as far as interiority + kappa requires
        # (the cold unit margin would erase the warmth, mu_0 ~ 1)
        shift_p = jnp.where(warm_ok, jnp.maximum(t_p + kappa, 0.0), shift_p)
    s0 = (s_cand[0] + shift_p * e_st, s_cand[1] + shift_p * e_g)

    _, (y0, y0g), (z0c, z0cg) = kkt_solve(
        fact0, rep0, rep0_g, (-c_st, -c_g),
        (jnp.zeros((K, me), dtype), jnp.zeros((meg,), dtype)),
        (jnp.zeros((K, mc), dtype), jnp.zeros((mcg,), dtype)),
        refine_steps=init_refine, raw_precision=settings.matmul_precision)
    if warm is not None:
        # warm duals (y_orig = D y^ c_scale, z_orig = D z^ c_scale)
        y0 = jnp.where(warm_ok, warm.y_stage / (d_eq * c_scale), y0)
        if meg:
            y0g = jnp.where(warm_ok, warm.y_glob / (d_geq * c_scale), y0g)
        z0c = jnp.where(warm_ok, warm.z_stage / (d_c * c_scale), z0c)
        if mcg:
            z0cg = jnp.where(warm_ok, warm.z_glob / (d_cg * c_scale), z0cg)
    t_d = jnp.maximum(cones.min_shift(z0c),
                      cones_g.min_shift(z0cg[None]))
    shift_d = jnp.where(t_d < -1e-8, 0.0, t_d + 1.0)
    if warm is not None:
        shift_d = jnp.where(warm_ok, jnp.maximum(t_d + kappa, 0.0), shift_d)
    z0 = (z0c + shift_d * e_st, z0cg + shift_d * e_g)

    import os as _os
    if _os.environ.get("SCPP_IPM_DEBUG"):
        jax.debug.print(
            "init |x0|={a:.3e} |s0|={b:.3e} |z0|={c:.3e} shift_p={d:.3e} "
            "shift_d={e:.3e} |s_cand|={f:.3e} |z_cand|={g:.3e} "
            "c_scale={cs:.3e} b_scale={bs:.3e}",
            a=jnp.max(jnp.abs(x0)), b=jnp.max(jnp.abs(s0[0])),
            c=jnp.max(jnp.abs(z0[0])), d=shift_p, e=shift_d,
            f=jnp.max(jnp.abs(s_cand[0])), g=jnp.max(jnp.abs(z0c)),
            cs=c_scale, bs=b_scale)

    # in-loop residuals: un-Ruiz'd scaled residuals, scaled back to original
    # units and normalized by the original data norms
    bnorm_o = 1.0 + jnp.sqrt(
        jnp.sum(prog.b_eq ** 2) + jnp.sum(prog.b_geq ** 2)
        + jnp.sum(prog.h ** 2) + jnp.sum(prog.h_g ** 2))
    cnorm_o = 1.0 + jnp.sqrt(
        jnp.sum(prog.c_stage ** 2) + jnp.sum(prog.c_glob ** 2))
    pres_fac = b_scale / bnorm_o
    dres_fac = c_scale / cnorm_o

    def residuals_and_score(x, y, s, z):
        """KKT residuals of an iterate + the original-space score used for
        best-iterate tracking (shared by the loop body and the post-loop
        scoring of the final stepped iterate)."""
        at_st, at_g = AG_rmv(y[0], y[1], z[0], z[1])
        rx = (c_st + at_st, c_g + at_g)
        (a_st, a_g), (gv_st, gv_g) = AG_mv(*x)
        ry = (a_st - b_eq, a_g - b_geq)
        rz = (gv_st + s[0] - h, gv_g + s[1] - h_g)
        gap = dot(s, z)
        pres = jnp.sqrt(
            jnp.sum((ry[0] / d_eq) ** 2)
            + (jnp.sum((ry[1] / d_geq) ** 2) if meg else 0.0)
            + jnp.sum((rz[0] / d_c) ** 2)
            + (jnp.sum((rz[1] / d_cg) ** 2) if mcg else 0.0)) * pres_fac
        dres = jnp.sqrt(
            jnp.sum((rx[0] / E_st) ** 2)
            + (jnp.sum((rx[1] / E_g) ** 2) if g else 0.0)) * dres_fac
        obj_now = dot((c_st, c_g), x)
        # gap criterion in ORIGINAL units, relative to the original-scale
        # primal/dual objectives: scaled-space tolerances are meaningless
        # here — s'z(original) = c_scale*b_scale * s'z(scaled), so a scaled
        # gap of eps corresponds to an original gap of ~1e5*eps, and judging
        # the scaled value let the loop declare victory on iterates that
        # were feasible but ~100% suboptimal (which corrupted the SCvx
        # ratio test into runaway trust-region growth)
        by_now = (jnp.sum(b_eq * y[0]) + jnp.sum(h * z[0])
                  + (jnp.sum(b_geq * y[1]) if meg else 0.0)
                  + (jnp.sum(h_g * z[1]) if mcg else 0.0))
        cb = c_scale * b_scale
        relgap = (cb * jnp.abs(gap)
                  / (1.0 + cb * (jnp.abs(obj_now) + jnp.abs(by_now))))
        score = jnp.maximum(jnp.maximum(pres, dres), relgap)
        score = jnp.where(jnp.isfinite(score), score, jnp.inf)
        return rx, ry, rz, gap, pres, dres, relgap, obj_now, score

    def body(carry, _):
        x, y, s, z, done, best = carry
        x_st, x_g = x
        y_st, y_g = y
        s_st, s_g = s
        z_st, z_g = z

        rx, ry, rz, gap, pres, dres, relgap, obj_now, score = \
            residuals_and_score(x, y, s, z)
        mu = gap / nu_deg

        # under mixed_f64 the carried s/z are f64, so the NT scaling's
        # cancelling determinants are computed in f64 automatically
        rep, lam = cones.nt_scaling(s_st, z_st)
        rep_g, lam_g = cones_g.nt_scaling(s_g[None], z_g[None])
        lam_g = lam_g[0]
        fact = kkt_factor(rep, rep_g)
        lam_lam = (cones.mul(lam, lam), cones_g.mul(lam_g[None],
                                                    lam_g[None])[0])
        lam_inv = (cones.inv(lam), cones_g.inv(lam_g[None])[0])

        # predictor — on the mixed-precision path, refined one sweep fewer
        # than the corrector: its only products are sigma (a scalar
        # heuristic) and the second-order Mehrotra term, neither of which
        # needs the last digit, and each refinement sweep is a full KKT
        # solve + operator matvec chain. The full-precision path keeps the
        # configured sweep count (advisor r03: don't change the default
        # path's numerics to pay for the bf16 path's budget).
        pred_refine = (max(settings.refine_steps - 1, 0)
                       if settings.kkt_precision != "highest"
                       else settings.refine_steps)
        dxa, dya, dza = kkt_solve(
            fact, rep, rep_g,
            (-rx[0], -rx[1]), (-ry[0], -ry[1]),
            (rz[0] - s_st, rz[1] - s_g),
            refine_steps=pred_refine)
        gva = G_mv(*dxa)
        dsa = (-gva[0] - rz[0], -gva[1] - rz[1])
        # s and z share the cone layout: one stacked max_step call computes
        # min(a_s, a_z) directly (the batch axis only feeds a global min)
        a_sz = jnp.minimum(
            cones.max_step(jnp.concatenate([s_st, z_st], 0),
                           jnp.concatenate([dsa[0], dza[0]], 0)),
            cones_g.max_step(jnp.stack([s_g, z_g]),
                             jnp.stack([dsa[1], dza[1]])))
        alpha_aff = jnp.minimum(1.0, a_sz)
        gap_aff = dot((s_st + alpha_aff * dsa[0], s_g + alpha_aff * dsa[1]),
                      (z_st + alpha_aff * dza[0], z_g + alpha_aff * dza[1]))
        sigma = jnp.clip((jnp.maximum(gap_aff, 0.0) /
                          jnp.maximum(gap, 1e-30)) ** 3, 0.0, 1.0)
        # a non-finite predictor (fp32 KKT breakdown at mu ~ roundoff)
        # must not poison the corrector through sigma — fall back to a
        # pure centering step; the finiteness guard below still freezes
        # the iterate if the corrector direction is bad too
        sigma = jnp.where(jnp.isfinite(sigma), sigma, 1.0)

        # corrector (Mehrotra second-order term dropped if the predictor
        # broke down — degrades to a centering step instead of NaN)
        corr_st = cones.mul(cones.apply_Winv(rep, dsa[0]),
                            cones.apply_W(rep, dza[0]))
        corr_g = cones_g.mul(
            cones_g.apply_Winv(rep_g, dsa[1][None]),
            cones_g.apply_W(rep_g, dza[1][None]))[0]
        corr_st = jnp.where(jnp.isfinite(corr_st), corr_st, 0.0)
        corr_g = jnp.where(jnp.isfinite(corr_g), corr_g, 0.0)
        d_st = cones.mul(lam_inv[0],
                         -lam_lam[0] - corr_st + sigma * mu * e_st)
        d_g = cones_g.mul(lam_inv[1][None],
                          (-lam_lam[1] - corr_g + sigma * mu * e_g)[None])[0]
        dxc, dyc, dzc = kkt_solve(
            fact, rep, rep_g,
            (-rx[0], -rx[1]), (-ry[0], -ry[1]),
            (rz[0] + cones.apply_W(rep, d_st),
             rz[1] + cones_g.apply_W(rep_g, d_g[None])[0]))
        gvc = G_mv(*dxc)
        dsc = (-gvc[0] - rz[0], -gvc[1] - rz[1])
        a_sz = jnp.minimum(
            cones.max_step(jnp.concatenate([s_st, z_st], 0),
                           jnp.concatenate([dsc[0], dzc[0]], 0)),
            cones_g.max_step(jnp.stack([s_g, z_g]),
                             jnp.stack([dsc[1], dzc[1]])))
        alpha = jnp.minimum(1.0, settings.step_frac * a_sz)

        x_n = (x_st + alpha * dxc[0], x_g + alpha * dxc[1])
        y_n = (y_st + alpha * dyc[0], y_g + alpha * dyc[1])
        s_n = (s_st + alpha * dsc[0], s_g + alpha * dsc[1])
        z_n = (z_st + alpha * dzc[0], z_g + alpha * dzc[1])

        conv = (pres < settings.eps_feas) & (dres < settings.eps_feas) & \
               (relgap < settings.eps_feas)

        import os as _os
        if _os.environ.get("SCPP_IPM_DEBUG"):
            jax.debug.print(
                "pres={p:.3e} dres={d:.3e} gap={g:.3e} relgap={rg:.3e} "
                "mu={m:.3e} sig={s:.3e} a_aff={aa:.3e} a={a:.3e} "
                "obj={o:.3e}",
                p=pres, d=dres, g=gap, rg=relgap, m=mu, s=sigma,
                aa=alpha_aff, a=alpha, o=obj_now)
        bx, by, bs, bz, bscore = best
        better = score < bscore

        def bsel(new, old):
            return (jnp.where(better, new[0], old[0]),
                    jnp.where(better, new[1], old[1]))

        best = (bsel(x, bx), bsel(y, by), bsel(s, bs), bsel(z, bz),
                jnp.where(better, score, bscore))

        finite = (jnp.all(jnp.isfinite(x_n[0])) & jnp.all(jnp.isfinite(x_n[1]))
                  & jnp.all(jnp.isfinite(s_n[0])) & jnp.all(jnp.isfinite(s_n[1]))
                  & jnp.all(jnp.isfinite(z_n[0])) & jnp.all(jnp.isfinite(z_n[1])))
        done_n = done | conv | jnp.logical_not(finite)
        keep = jnp.logical_not(done) & finite

        def sel(new, old):
            return (jnp.where(keep, new[0], old[0]),
                    jnp.where(keep, new[1], old[1]))

        return (sel(x_n, x), sel(y_n, y), sel(s_n, s), sel(z_n, z),
                done_n, best), None

    # mixed_f64: the loop carries f64 iterates (see the mode note above)
    (x0, x0g), (y0, y0g), s0, z0 = _lift(((x0, x0g), (y0, y0g), s0, z0))
    best0 = ((x0, x0g), (y0, y0g), s0, z0,
             jnp.asarray(jnp.inf, compute_dtype))
    carry0 = ((x0, x0g), (y0, y0g), s0, z0, jnp.asarray(False), best0)

    # early-exit while_loop instead of a fixed-trip scan: the typical
    # subproblem converges well inside the budget, and under vmap the
    # batching rule keeps iterating only while *some* scenario is active
    # (done scenarios' carries are select-frozen) — same results as the
    # scan, ~1.5-2x less wall time
    def w_cond(state):
        i, carry = state
        return (i < settings.iters) & jnp.logical_not(carry[4])

    def w_body(state):
        i, carry = state
        carry, _ = body(carry, None)
        return (i + 1, carry)

    _, (x_f, y_f, s_f, z_f, _, best) = jax.lax.while_loop(
        w_cond, w_body, (jnp.asarray(0, jnp.int32), carry0))

    # score the final post-step iterate into `best`: the loop body scores
    # the *pre-step* iterate, so on the exiting iteration the freshly
    # stepped x_n would otherwise go unscored and the returned solution
    # could be one IPM step staler than the fixed-trip scan's
    *_, fscore = residuals_and_score(x_f, y_f, s_f, z_f)
    bx, by, bs, bz, bscore = best
    fbetter = fscore < bscore

    def _fsel(new, old):
        return (jnp.where(fbetter, new[0], old[0]),
                jnp.where(fbetter, new[1], old[1]))

    best = (_fsel(x_f, bx), _fsel(y_f, by), _fsel(s_f, bs),
            _fsel(z_f, bz), jnp.where(fbetter, fscore, bscore))
    (x_st, x_g), (y_st, y_g), (s_st, s_g), (z_st, z_g), _ = best

    # unscale to original data:  x = E x^ b_s,  y = D y^ c_s,  s = s^ b_s / D
    x_st = x_st * E_st * b_scale
    x_g = x_g * E_g * b_scale
    y_st = y_st * d_eq * c_scale
    y_g = y_g * d_geq * c_scale if meg else y_g
    z_st = z_st * d_c * c_scale
    z_g = z_g * d_cg * c_scale if mcg else z_g
    s_st_u = s_st / d_c * b_scale
    s_g_u = s_g / d_cg * b_scale if mcg else s_g

    obj = jnp.sum(prog.c_stage * x_st) + jnp.sum(prog.c_glob * x_g)

    # original-space residuals for the caller
    def orig_mv(M_st, M_g):
        xc = jnp.concatenate(
            [x_st,
             jnp.concatenate([x_st[1:], jnp.zeros((1, w), dtype)], 0),
             jnp.broadcast_to(x_g, (K, g))], axis=1)
        st = jnp.einsum("kmc,kc->km", M_st, xc, precision=_P)
        gg = M_g @ x_g if M_g.shape[0] else jnp.zeros((M_g.shape[0],), dtype)
        return st, gg

    def orig_rmv(M_st, M_g, v_st, v_g):
        xc = jnp.einsum("kmc,km->kc", M_st, v_st, precision=_P)
        o_st = xc[:, :w].at[1:].add(xc[:-1, w:2 * w])
        o_g = jnp.sum(xc[:, 2 * w:], axis=0)
        if M_g.shape[0]:
            o_g = o_g + M_g.T @ v_g
        return o_st, o_g

    aeq_st, aeq_g = orig_mv(prog.A_eq, prog.A_geq)
    gc_st, gc_g = orig_mv(prog.G, prog.G_g)
    res_pri = jnp.sqrt(
        jnp.sum((aeq_st - prog.b_eq) ** 2)
        + jnp.sum((aeq_g - prog.b_geq) ** 2)
        + jnp.sum((gc_st + s_st_u - prog.h) ** 2)
        + jnp.sum((gc_g + s_g_u - prog.h_g) ** 2)) / bnorm_o

    at_st, at_g = orig_rmv(prog.A_eq, prog.A_geq, y_st, y_g)
    gt_st, gt_g = orig_rmv(prog.G, prog.G_g, z_st, z_g)
    res_dua = jnp.sqrt(
        jnp.sum((prog.c_stage + at_st + gt_st) ** 2)
        + jnp.sum((prog.c_glob + at_g + gt_g) ** 2)) / cnorm_o

    by = (jnp.sum(prog.b_eq * y_st) + jnp.sum(prog.b_geq * y_g)
          + jnp.sum(prog.h * z_st) + jnp.sum(prog.h_g * z_g))
    res_gap = jnp.abs(obj + by) / (1.0 + jnp.abs(obj) + jnp.abs(by))

    # cast back to the working dtype (under mixed_f64 the final residual
    # arithmetic above ran in f64; callers carry results in fp32 pytrees)
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype),
        StagedSolverResult(
            x_stage=x_st, x_glob=x_g, obj=obj,
            res_pri=res_pri, res_dua=res_dua, res_gap=res_gap,
            y_stage=y_st, y_glob=y_g, z_stage=z_st, z_glob=z_g))
