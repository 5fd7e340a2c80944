"""Monolithic Pallas IPM: the ENTIRE staged conic solve in one dispatch.

The round-4 profile (PERF.md §2) established that the staged NT-Mehrotra
IPM is op-dispatch bound on TPU: every constituent XLA op at flagship
shapes (K=30, w=32, me=16, mc=52) runs in <=0.2 ms, yet one IPM
iteration costs ~8.6 ms — ~300 small kernels each paying tens of
microseconds of fixed launch overhead. Fusing only the CR solve
(solver/cr_pallas.py) was perf-neutral because the overhead is spread
across the whole iteration. This module fuses the WHOLE SOLVE — init,
the Mehrotra predictor-corrector loop (NT scaling, Gram/KKT assembly,
cyclic-reduction factorization, triangular solves, cone step lengths),
best-iterate tracking and early exit — into ONE Pallas kernel per
sub-batch of scenarios, with all state resident in VMEM.

Numerics mirror solver/ipm_staged._solve_impl for the no-global-block
case (gm == 0: the SCvx trajectory subproblems); the same Ruiz
equilibration and cost/rhs normalization run in XLA once per solve, and
the original-space residual reporting is unchanged. Divergences are
reassociation-level only; equivalence is tested in
tests/test_ipm_mono.py and the TPU smoke suite.

Batching: scenarios are the kernel's leading axis (grid over sub-batches
of ``MONO_BSUB``). ``solve_staged_ipm`` routes here under ``jax.vmap``
through a ``custom_vmap`` rule, so callers keep the exact vmapped-solver
API while the hardware sees one fused kernel per sub-batch — and each
sub-batch exits its in-kernel while_loop as soon as ITS scenarios
converge, instead of spinning with the slowest scenario of the whole
lockstep batch.

Replaces the per-subproblem ECOS call of the reference
(scpp_core/src/SCAlgorithm.cpp:77-81) at the kernel level.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scpp_tpu.solver.ipm import IPMSettings
from scpp_tpu.solver.mono_blocks import bmv, bmv_t, mono_cr_factor, \
    mono_cr_solve
from scpp_tpu.solver.mono_cones import MonoCones
from scpp_tpu.solver.staged import StagedProgram

__all__ = ["mono_supported", "solve_staged_ipm_mono", "MONO_BSUB"]

_HI = jax.lax.Precision.HIGHEST

# scenarios per grid step: trades Mosaic compile time (scales with
# per-op tensor size) against runtime (the kernel is issue-bound, so
# larger sub-batches amortize the instruction stream); VMEM-bounded at
# ~2 MB live state per flagship scenario. Measured on v5e at B=64:
# bsub=4 -> 102 ms/solve batch. Env-overridable for sweeps.
import os as _os

MONO_BSUB = int(_os.environ.get("SCPP_MONO_BSUB", "4"))


def mono_supported(prog: StagedProgram, settings: IPMSettings) -> bool:
    """The fused path covers the trajectory-subproblem shape class; the
    general path (global rows/cones, f64 lanes, bf16 KKT) stays on the
    unfused solver."""
    gm_zero = (prog.g == 0 and prog.A_geq.shape[0] == 0
               and prog.G_g.shape[0] == 0)
    return (gm_zero
            and settings.kkt_dtype == "working"
            and not settings.refine_f64
            and settings.matmul_precision == "highest"
            and settings.kkt_precision == "highest"
            and prog.w % 8 == 0
            and (prog.me % 8 == 0 or prog.me == 0))


# ---------------------------------------------------------------------------
# the fused solve on (B, K, ...) values — pure jnp, runs identically
# inside the Pallas kernel, under plain jit (CPU tests), and interpreted
# ---------------------------------------------------------------------------


def _solve_block(statics, AT, GT, b_eq, h, c, d_eq, d_c, E_st, scal,
                 warm_x, warm_y, warm_z, part="full"):
    """One sub-batch's complete IPM solve.

    statics: (K, w, me, l, soc_sizes, settings); AT/GT are the
    TRANSPOSED constraint blocks (B, K, 2w, me) / (B, K, 2w, mc) — the
    cone dim in lanes so the row-wise W^{-1} application is the ordinary
    slot-broadcast cone op; ``scal`` (B, 4) = [pres_fac, dres_fac,
    c_scale*b_scale, warm_ok].
    """
    K, w, me, l, soc_sizes, st = statics
    B = AT.shape[0]
    dtype = AT.dtype
    Wp = w + me
    mc = l + sum(soc_sizes)
    cones = MonoCones(l, soc_sizes, dtype)
    e_st = cones.e                                            # (1,1,mc)
    nu_deg = max(K * cones.deg_per_stage, 1)

    eps = jnp.asarray(st.eps_reg, dtype)
    delta = jnp.asarray(st.eps_reg, dtype)
    rho = jnp.asarray(st.rho_lift, dtype)
    sqrho = jnp.sqrt(rho)

    scal = scal.reshape(B, 4)    # fed as (B, 1, 4): a (bsub, 4) block
    pres_fac = scal[:, 0:1]      # would break the (8,128)-divisibility
    dres_fac = scal[:, 1:2]      # rule on the sublane dim at small bsub
    cb = scal[:, 2:3]
    warm_ok = scal[:, 3:4] > 0.5                              # (B,1)
    warm3 = warm_ok[:, :, None]

    ATf = AT.reshape(B * K, 2 * w, me)
    GTf = GT.reshape(B * K, 2 * w, mc)

    # ---- staged matvecs (mirror ipm_staged cat_x/uncat/AG_mv/AG_rmv) ----

    def cat_x(x):
        x_next = jnp.concatenate(
            [x[:, 1:], jnp.zeros((B, 1, w), dtype)], axis=1)
        return jnp.concatenate([x, x_next], axis=2).reshape(B * K, 2 * w)

    def uncat(xc_flat):
        xc = xc_flat.reshape(B, K, 2 * w)
        shift = jnp.concatenate(
            [jnp.zeros((B, 1, w), dtype), xc[:, :-1, w:]], axis=1)
        return xc[:, :, :w] + shift

    def AG_mv(x):
        xc = cat_x(x)
        return (bmv_t(ATf, xc).reshape(B, K, me),
                bmv_t(GTf, xc).reshape(B, K, mc))

    def AG_rmv(y, z):
        v = bmv(ATf, y.reshape(B * K, me)) \
            + bmv(GTf, z.reshape(B * K, mc))
        return uncat(v)

    def A_mv(x):
        return bmv_t(ATf, cat_x(x)).reshape(B, K, me)

    def G_mv(x):
        return bmv_t(GTf, cat_x(x)).reshape(B, K, mc)

    def sdot(a, b):
        # two-step reductions: multi-axis reduces emit 1-D intermediates,
        # which crash the Mosaic layout pass
        return jnp.sum(jnp.sum(a * b, axis=2), axis=1, keepdims=True)

    def snorm2(t):
        return jnp.sum(jnp.sum(t * t, axis=2), axis=1, keepdims=True)

    # ---- KKT factor / solve (mirror _kkt_factor_impl, gm=0) ----

    I_w = jnp.eye(w, dtype=dtype)
    I_me = jnp.eye(me, dtype=dtype)

    def kkt_factor(rep_rows):
        """rep_rows: scaling rep broadcastable over (B*K, 2w, mc)."""
        GwT = cones.apply_Winv(rep_rows, GTf)                 # (BK,2w,mc)
        Gam = jax.lax.dot_general(
            GwT, GwT, (((2,), (2,)), ((0,), (0,))),
            precision=_HI, preferred_element_type=dtype)      # (BK,2w,2w)
        Gam = Gam + rho * jax.lax.dot_general(
            ATf, ATf, (((2,), (2,)), ((0,), (0,))),
            precision=_HI, preferred_element_type=dtype)
        Hxx = Gam[:, :w, :w].reshape(B, K, w, w)
        Hnn = Gam[:, w:, w:].reshape(B, K, w, w)
        Hxn = Gam[:, w:, :w].reshape(B, K, w, w)

        Dxx = eps * I_w + Hxx
        Dxx = Dxx + jnp.concatenate(
            [jnp.zeros((B, 1, w, w), dtype), Hnn[:, :-1]], axis=1)
        Dxy = AT[:, :, :w, :]                                 # (B,K,w,me)
        Dyy = jnp.broadcast_to(-delta * I_me, (B, K, me, me))
        D = jnp.concatenate([
            jnp.concatenate([Dxx, Dxy], axis=3),
            jnp.concatenate([jnp.swapaxes(Dxy, 2, 3), Dyy], axis=3)],
            axis=2)                                           # (B,K,Wp,Wp)

        Oxx = Hxn[:, :-1]
        Oxy = AT[:, :-1, w:, :]                               # (B,K-1,w,me)
        O = jnp.concatenate([
            jnp.concatenate([Oxx, Oxy], axis=3),
            jnp.zeros((B, K - 1, me, Wp), dtype)], axis=2)
        return mono_cr_factor(D, O, w)

    def kkt_raw_solve(fact, r_x, r_y):
        b_stage = jnp.concatenate([r_x, r_y], axis=2)         # (B,K,Wp)
        sol = mono_cr_solve(fact, b_stage, w)
        return sol[:, :, :w], sol[:, :, w:]

    def kkt_solve(fact, rep, f1, f2, rzWd, refine_steps):
        u3 = cones.apply_Winv2(rep, rzWd)
        mf = AG_rmv(rho * f2, -u3)
        r1 = f1 + mf
        dx, dy = kkt_raw_solve(fact, r1, f2)
        for _ in range(refine_steps):
            ax, gx = AG_mv(dx)
            wx = cones.apply_Winv2(rep, gx)
            mx = AG_rmv(rho * ax + dy, wx)
            cx, cy = kkt_raw_solve(fact, r1 - mx, f2 - ax)
            dx = dx + cx
            dy = dy + cy
        dz = cones.apply_Winv2(rep, G_mv(dx)) + u3
        return dx, dy, dz

    # ---- initialization (mirror the conelp-style init) ----

    rep0 = cones.identity_rep(dtype)       # (1,1,mc): broadcasts both
    fact0 = kkt_factor(rep0)               # over rows and over (B,K)
    init_refine = 0                                # kkt_precision="highest"
    zeros_w = jnp.zeros((B, K, w), dtype)
    zeros_me = jnp.zeros((B, K, me), dtype)
    zeros_mc = jnp.zeros((B, K, mc), dtype)
    kappa = jnp.asarray(st.warm_kappa, dtype)

    x0, _, _ = kkt_solve(fact0, rep0, zeros_w, b_eq, -h, init_refine)
    x0 = jnp.where(warm3, warm_x, x0)
    s_cand = h - G_mv(x0)
    t_p = cones.min_shift(s_cand)                             # (B,1)
    shift_p = jnp.where(t_p < -1e-8, 0.0, t_p + 1.0)
    shift_p = jnp.where(warm_ok, jnp.maximum(t_p + kappa, 0.0), shift_p)
    s0 = s_cand + shift_p[:, :, None] * e_st

    _, y0, z0c = kkt_solve(fact0, rep0, -c, zeros_me, zeros_mc,
                           init_refine)
    y0 = jnp.where(warm3, warm_y, y0)
    z0c = jnp.where(warm3, warm_z, z0c)
    t_d = cones.min_shift(z0c)
    shift_d = jnp.where(t_d < -1e-8, 0.0, t_d + 1.0)
    shift_d = jnp.where(warm_ok, jnp.maximum(t_d + kappa, 0.0), shift_d)
    z0 = z0c + shift_d[:, :, None] * e_st

    # ---- residuals + score (mirror residuals_and_score) ----

    def residuals_and_score(x, y, s, z):
        at = AG_rmv(y, z)
        rx = c + at
        a, gv = AG_mv(x)
        ry = a - b_eq
        rz = gv + s - h
        gap = sdot(s, z)
        pres = jnp.sqrt(snorm2(ry / d_eq) + snorm2(rz / d_c)) * pres_fac
        dres = jnp.sqrt(snorm2(rx / E_st)) * dres_fac
        obj_now = sdot(c, x)
        by_now = sdot(b_eq, y) + sdot(h, z)
        relgap = (cb * jnp.abs(gap)
                  / (1.0 + cb * (jnp.abs(obj_now) + jnp.abs(by_now))))
        score = jnp.maximum(jnp.maximum(pres, dres), relgap)
        score = jnp.where(jnp.isfinite(score), score, jnp.inf)
        return rx, ry, rz, gap, pres, dres, relgap, score

    pred_refine = max(st.refine_steps - 1, 0) \
        if st.kkt_precision != "highest" else st.refine_steps

    def sfinite(t):
        return jnp.all(jnp.all(jnp.isfinite(t), axis=2), axis=1,
                       keepdims=True)

    track_best = st.mono_track_best

    def body(carry):
        x, y, s, z, done, bx, by_, bs, bz, bscore, it = carry
        rx, ry, rz, gap, pres, dres, relgap, score = \
            residuals_and_score(x, y, s, z)
        mu = gap / nu_deg

        rep, lam = cones.nt_scaling(s, z)
        fact = kkt_factor(MonoCones.expand_rep(rep))
        lam_lam = cones.mul(lam, lam)
        lam_inv = cones.inv(lam)

        dxa, dya, dza = kkt_solve(fact, rep, -rx, -ry, rz - s,
                                  pred_refine)
        dsa = -G_mv(dxa) - rz
        a_sz = jnp.minimum(cones.max_step(s, dsa),
                           cones.max_step(z, dza))
        alpha_aff = jnp.minimum(1.0, a_sz)
        gap_aff = sdot(s + alpha_aff[:, :, None] * dsa,
                       z + alpha_aff[:, :, None] * dza)
        sigma = jnp.clip((jnp.maximum(gap_aff, 0.0)
                          / jnp.maximum(gap, 1e-30)) ** 3, 0.0, 1.0)
        sigma = jnp.where(jnp.isfinite(sigma), sigma, 1.0)

        corr = cones.mul(cones.apply_Winv(rep, dsa),
                         cones.apply_W(rep, dza))
        corr = jnp.where(jnp.isfinite(corr), corr, 0.0)
        d_st = cones.mul(
            lam_inv, -lam_lam - corr + (sigma * mu)[:, :, None] * e_st)
        dxc, dyc, dzc = kkt_solve(fact, rep, -rx, -ry,
                                  rz + cones.apply_W(rep, d_st),
                                  st.refine_steps)
        dsc = -G_mv(dxc) - rz
        a_sz = jnp.minimum(cones.max_step(s, dsc),
                           cones.max_step(z, dzc))
        alpha = jnp.minimum(1.0, st.step_frac * a_sz)[:, :, None]

        x_n = x + alpha * dxc
        y_n = y + alpha * dyc
        s_n = s + alpha * dsc
        z_n = z + alpha * dzc

        conv = ((pres < st.eps_feas) & (dres < st.eps_feas)
                & (relgap < st.eps_feas))

        if track_best:
            better = (score < bscore)[:, :, None]
            bx = jnp.where(better, x, bx)
            by_ = jnp.where(better, y, by_)
            bs = jnp.where(better, s, bs)
            bz = jnp.where(better, z, bz)
            bscore = jnp.minimum(score, bscore)

        # ``done`` is carried as 0/1 float: Mosaic cannot yield i1
        # vectors from scf.while
        finite = sfinite(x_n) & sfinite(s_n) & sfinite(z_n)
        active = done < 0.5
        done_n = jnp.where(active & conv, 1.0,
                           jnp.where(finite, done, 1.0))
        keep = (active & finite)[:, :, None]

        x = jnp.where(keep, x_n, x)
        y = jnp.where(keep, y_n, y)
        s = jnp.where(keep, s_n, s)
        z = jnp.where(keep, z_n, z)
        return (x, y, s, z, done_n, bx, by_, bs, bz, bscore, it + 1)

    inf_score = jnp.full((B, 1), jnp.inf, dtype)
    zer = jnp.zeros((B, 1), dtype)
    if track_best:
        carry0 = (x0, y0, s0, z0, zer,
                  x0, y0, s0, z0, inf_score, jnp.asarray(0, jnp.int32))
    else:
        # placeholder best slots (1-element, never updated) keep the
        # carry structure uniform without the 2x state footprint
        carry0 = (x0, y0, s0, z0, zer,
                  x0[:, :1, :1], y0[:, :1, :1], s0[:, :1, :1],
                  z0[:, :1, :1], inf_score, jnp.asarray(0, jnp.int32))

    # ``part`` is a compile-isolation debug hook (tools/diag/mono_parts)
    if part == "init":
        diag = jnp.zeros((B, 1, 4), dtype)
        return x0, y0, s0, z0, diag

    def w_cond(carry):
        done, it = carry[4], carry[10]
        return (it < st.iters) & (jnp.min(done) < 0.5)

    if part.startswith("iter"):
        carry = carry0
        for _ in range(int(part[4:])):
            carry = body(carry)
        x_f, y_f, s_f, z_f, _, bx, by_, bs, bz, bscore, it_f = carry
    else:
        x_f, y_f, s_f, z_f, _, bx, by_, bs, bz, bscore, it_f = \
            jax.lax.while_loop(w_cond, body, carry0)

    # score the final stepped iterate (mirror the post-loop rescoring)
    *_, fscore = residuals_and_score(x_f, y_f, s_f, z_f)
    if track_best:
        fbetter = (fscore < bscore)[:, :, None]
        x_b = jnp.where(fbetter, x_f, bx)
        y_b = jnp.where(fbetter, y_f, by_)
        s_b = jnp.where(fbetter, s_f, bs)
        z_b = jnp.where(fbetter, z_f, bz)
    else:
        x_b, y_b, s_b, z_b = x_f, y_f, s_f, z_f

    diag = jnp.concatenate(
        [jnp.minimum(fscore, bscore),
         jnp.broadcast_to(it_f.astype(dtype)[None, None], (B, 1)),
         jnp.zeros((B, 2), dtype)], axis=1)[:, None, :]   # (B, 1, 4)
    return x_b, y_b, s_b, z_b, diag


# ---------------------------------------------------------------------------
# Pallas wrapper
# ---------------------------------------------------------------------------


def _mono_kernel(statics, *refs):
    ins = refs[:12]
    outs = refs[12:]
    vals = [r[:] for r in ins]
    x, y, s, z, diag = _solve_block(statics, *vals)
    outs[0][:] = x
    outs[1][:] = y
    outs[2][:] = s
    outs[3][:] = z
    outs[4][:] = diag


@partial(jax.jit, static_argnums=(0, 1, 2))
def _mono_pallas(statics, bsub: int, interpret: bool, *args):
    """args: the 12 batched kernel inputs with leading B (B % bsub == 0)."""
    K, w, me, l, soc_sizes, _ = statics
    B = args[0].shape[0]
    dtype = args[0].dtype
    mc = l + sum(soc_sizes)
    grid = (B // bsub,)

    def bspec(shape):
        nd = len(shape)
        return pl.BlockSpec((bsub,) + shape,
                            lambda i, _nd=nd: (i,) + (0,) * _nd,
                            memory_space=pltpu.VMEM)

    in_shapes = [(K, 2 * w, me), (K, 2 * w, mc), (K, me), (K, mc), (K, w),
                 (K, me), (K, mc), (K, w), (1, 4), (K, w), (K, me), (K, mc)]
    out_shapes = [(K, w), (K, me), (K, mc), (K, mc), (1, 4)]
    return pl.pallas_call(
        partial(_mono_kernel, statics),
        grid=grid,
        out_shape=[jax.ShapeDtypeStruct((B,) + s, dtype)
                   for s in out_shapes],
        in_specs=[bspec(s) for s in in_shapes],
        out_specs=[bspec(s) for s in out_shapes],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# XLA-side prep/post (Ruiz equilibration, scaling, original residuals)
# ---------------------------------------------------------------------------


def _prep(prog: StagedProgram, settings: IPMSettings, warm_x, warm_y,
          warm_z, warm_ok):
    """Unbatched per-scenario prep; vmapped over scenarios by the caller.

    Mirrors ipm_staged._solve_impl's equilibration + normalization
    (everything up to the cone init) and pre-scales the warm-start state
    into the equilibrated space."""
    from scpp_tpu.solver.ipm_staged import _staged_ruiz

    K, w = prog.K, prog.w
    dtype = prog.A_eq.dtype
    E_st, _, d_eq, d_c, _, _ = _staged_ruiz(prog, settings.ruiz_iters)
    Ecat = jnp.concatenate([
        E_st, jnp.concatenate([E_st[1:], jnp.ones((1, w), dtype)], 0)],
        axis=1)
    A_eq = prog.A_eq[:, :, :2 * w] * d_eq[:, :, None] * Ecat[:, None, :]
    G = prog.G[:, :, :2 * w] * d_c[:, :, None] * Ecat[:, None, :]
    b_eq = prog.b_eq * d_eq
    h = prog.h * d_c
    c_st = prog.c_stage * E_st

    cabs = jnp.abs(c_st).ravel()
    c_scale = jnp.maximum(
        1.0, jnp.nanmedian(jnp.where(cabs > 0, cabs, jnp.nan)))
    c_scale = jnp.where(jnp.isfinite(c_scale), c_scale, 1.0)
    b_scale = jnp.maximum(1.0, jnp.sqrt(
        jnp.sum(b_eq ** 2) + jnp.sum(h ** 2)))
    c_st = c_st / c_scale
    b_eq = b_eq / b_scale
    h = h / b_scale

    bnorm_o = 1.0 + jnp.sqrt(jnp.sum(prog.b_eq ** 2)
                             + jnp.sum(prog.h ** 2))
    cnorm_o = 1.0 + jnp.sqrt(jnp.sum(prog.c_stage ** 2))
    pres_fac = b_scale / bnorm_o
    dres_fac = c_scale / cnorm_o

    wx = warm_x / (E_st * b_scale)
    wy = warm_y / (d_eq * c_scale)
    wz = warm_z / (d_c * c_scale)
    scal = jnp.stack([pres_fac, dres_fac, c_scale * b_scale,
                      jnp.where(warm_ok, 1.0, 0.0).astype(dtype)]
                     ).reshape(1, 4)
    scales = (E_st, d_eq, d_c, c_scale, b_scale, bnorm_o, cnorm_o)
    AT = jnp.swapaxes(A_eq, -1, -2)
    GT = jnp.swapaxes(G, -1, -2)
    return (AT, GT, b_eq, h, c_st, d_eq, d_c, E_st, scal, wx, wy, wz), \
        scales


def _post(prog: StagedProgram, x_st, y_st, s_st, z_st, scales):
    """Unscale + original-space residuals (mirror _solve_impl's tail)."""
    from scpp_tpu.solver.ipm_staged import StagedSolverResult

    E_st, d_eq, d_c, c_scale, b_scale, bnorm_o, cnorm_o = scales
    K, w = prog.K, prog.w
    dtype = prog.A_eq.dtype
    x_st = x_st * E_st * b_scale
    y_st = y_st * d_eq * c_scale
    z_st = z_st * d_c * c_scale
    s_u = s_st / d_c * b_scale

    obj = jnp.sum(prog.c_stage * x_st)

    xc = jnp.concatenate(
        [x_st, jnp.concatenate([x_st[1:], jnp.zeros((1, w), dtype)], 0)],
        axis=1)
    A2 = prog.A_eq[:, :, :2 * w]
    G2 = prog.G[:, :, :2 * w]
    aeq = jnp.einsum("kmc,kc->km", A2, xc, precision=_HI)
    gc = jnp.einsum("kmc,kc->km", G2, xc, precision=_HI)
    res_pri = jnp.sqrt(jnp.sum((aeq - prog.b_eq) ** 2)
                       + jnp.sum((gc + s_u - prog.h) ** 2)) / bnorm_o

    atc = jnp.einsum("kmc,km->kc", A2, y_st, precision=_HI)
    gtc = jnp.einsum("kmc,km->kc", G2, z_st, precision=_HI)
    vc = atc + gtc
    at_st = vc[:, :w].at[1:].add(vc[:-1, w:])
    res_dua = jnp.sqrt(
        jnp.sum((prog.c_stage + at_st) ** 2)) / cnorm_o

    by = jnp.sum(prog.b_eq * y_st) + jnp.sum(prog.h * z_st)
    res_gap = jnp.abs(obj + by) / (1.0 + jnp.abs(obj) + jnp.abs(by))

    g0 = jnp.zeros((0,), dtype)
    return StagedSolverResult(
        x_stage=x_st, x_glob=jnp.zeros((prog.g,), dtype), obj=obj,
        res_pri=res_pri, res_dua=res_dua, res_gap=res_gap,
        y_stage=y_st, y_glob=g0, z_stage=z_st,
        z_glob=jnp.zeros((prog.G_g.shape[0],), dtype))


def _pick_bsub(B: int) -> int:
    for cand in range(min(B, MONO_BSUB), 0, -1):
        if B % cand == 0:
            return cand
    return 1


def _solve_mono_batched(statics, interpret, progs, warm_x, warm_y,
                        warm_z, warm_ok):
    """Batched (leading scenario axis) fused solve."""
    settings = statics[-1]
    ins, scales = jax.vmap(
        lambda p, a, b, cc, d: _prep(p, settings, a, b, cc, d)
    )(progs, warm_x, warm_y, warm_z, warm_ok)
    B = ins[0].shape[0]
    bsub = _pick_bsub(B)
    x, y, s, z, _ = _mono_pallas(statics, bsub, interpret, *ins)
    return jax.vmap(_post)(progs, x, y, s, z, scales)


@lru_cache(maxsize=32)
def _mono_entry(statics, interpret: bool):
    """custom_vmap'd entry: unbatched call = B=1; vmapped call = one
    fused kernel over the whole batch (instead of pallas_call's default
    one-scenario-per-grid-step batching rule, which would serialize the
    latency-bound recurrences B times)."""

    def base(progs, warm_x, warm_y, warm_z, warm_ok):
        # unbatched call: tile to 8 scenarios — (1, ...)-shaped reductions
        # hit a Mosaic "offset change" lowering bug, and the kernel is
        # issue-bound so the padding is nearly free
        def t8(a):
            return jnp.broadcast_to(a[None], (8,) + a.shape)
        eight = jax.tree_util.tree_map(t8, progs)
        res = _solve_mono_batched(
            statics, interpret, eight, t8(warm_x), t8(warm_y),
            t8(warm_z), t8(warm_ok))
        return jax.tree_util.tree_map(lambda a: a[0], res)

    fn = jax.custom_batching.custom_vmap(base)

    @fn.def_vmap
    def _rule(axis_size, in_batched, progs, warm_x, warm_y, warm_z,
              warm_ok):
        def bcast(leaf, batched):
            if batched:
                return leaf
            return jnp.broadcast_to(leaf[None], (axis_size,) + leaf.shape)
        progs_b = jax.tree_util.tree_map(bcast, progs, in_batched[0])
        wx = bcast(warm_x, in_batched[1])
        wy = bcast(warm_y, in_batched[2])
        wz = bcast(warm_z, in_batched[3])
        wo = bcast(warm_ok, in_batched[4])
        out = _solve_mono_batched(statics, interpret, progs_b, wx, wy,
                                  wz, wo)
        out_batched = jax.tree_util.tree_map(lambda _: True, out)
        return out, out_batched

    return fn


def solve_staged_ipm_mono(prog: StagedProgram,
                          settings: IPMSettings,
                          warm=None, warm_ok=False,
                          interpret: bool = None):
    """Drop-in fused replacement for solve_staged_ipm (gm == 0 shapes).

    ``interpret`` defaults to True off-TPU so CPU tests exercise the
    identical kernel code path."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    statics = (prog.K, prog.w, prog.me, prog.l, tuple(prog.soc_sizes),
               settings)
    dtype = prog.A_eq.dtype
    if warm is None:
        wx = jnp.zeros((prog.K, prog.w), dtype)
        wy = jnp.zeros((prog.K, prog.me), dtype)
        wz = jnp.zeros((prog.K, prog.mc), dtype)
    else:
        wx, wy, wz = warm.x_stage, warm.y_stage, warm.z_stage
    wo = jnp.asarray(warm_ok, bool)
    return _mono_entry(statics, bool(interpret))(prog, wx, wy, wz, wo)
