"""Structured Jordan-algebra / NT-scaling ops for the monolithic kernel.

Mirrors solver/ipm_staged._BatchCones numerically, re-laid-out for
Mosaic: tensors are (B, K, mc) (B scenarios — every reduction that the
vmapped unfused path performs per scenario is explicit here), SOC blocks
are gathered with *static per-cone lane slices* (no index-array gathers,
unsupported on TPU), and the NT scaling is kept in STRUCTURED form
(linear diag + per-cone rank-1 vectors) instead of the unfused path's
dense (mc, mc) W matrices — dense W at batch 64 x 30 stages would not
fit VMEM and is unnecessary: every apply is O(q) elementwise work.

Padding convention matches _BatchCones: the padded tail slots of every
(B, K, S, qmax) block read zero, so reductions only ever add zeros.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["MonoCones"]


class MonoCones:
    """Static cone layout [nonneg (l) | SOC q_1 | ... | SOC q_S]."""

    def __init__(self, l: int, soc_sizes):
        self.l = int(l)
        self.soc_sizes = tuple(int(q) for q in soc_sizes)
        self.mc = self.l + sum(self.soc_sizes)
        self.S = len(self.soc_sizes)
        self.qmax = max(self.soc_sizes) if self.soc_sizes else 0
        offs, off = [], self.l
        for q in self.soc_sizes:
            offs.append(off)
            off += q
        self.soc_offs = tuple(offs)
        self.deg_per_stage = self.l + self.S

    # constants are built from broadcasted_iota, NOT captured numpy
    # arrays: pallas_call rejects captured constants in kernel bodies

    def _head(self, dtype):
        """(1, 1, 1, qmax) indicator of the SOC head slot."""
        i = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, self.qmax), 3)
        return (i == 0).astype(dtype)

    def _jrow(self, dtype):
        """Reflection J = diag(1, -1, ...) as a broadcastable row."""
        i = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, self.qmax), 3)
        return jnp.where(i == 0, 1.0, -1.0).astype(dtype)

    def e(self, dtype):
        """Cone identity element, (1, 1, mc)."""
        lin = jnp.ones((1, 1, self.l), dtype)
        if not self.S:
            return lin
        head = jnp.broadcast_to(self._head(dtype),
                                (1, 1, self.S, self.qmax))
        return self.scatter(lin, head)

    # ---- layout ----

    def gather(self, u):
        """(B, K, mc) -> (B, K, S, qmax); pad slots read zero."""
        B, K = u.shape[:2]
        blocks = []
        for o, q in zip(self.soc_offs, self.soc_sizes):
            blk = u[:, :, o:o + q]
            if q < self.qmax:
                blk = jnp.concatenate(
                    [blk, jnp.zeros((B, K, self.qmax - q), u.dtype)],
                    axis=2)
            blocks.append(blk)
        return jnp.stack(blocks, axis=2)

    def scatter(self, lin, vals):
        """linear part (B, K, l) + SOC blocks (B, K, S, qmax) -> (B,K,mc)."""
        parts = [] if self.l == 0 else [lin]
        for i, q in enumerate(self.soc_sizes):
            parts.append(vals[:, :, i, :q])
        return jnp.concatenate(parts, axis=2)

    # ---- Jordan algebra (mirrors _BatchCones formulas) ----

    def mul(self, u, v):
        lin = u[:, :, :self.l] * v[:, :, :self.l]
        if not self.S:
            return lin
        ub, vb = self.gather(u), self.gather(v)
        head = jnp.sum(ub * vb, axis=3, keepdims=True)
        tail = ub[..., :1] * vb[..., 1:] + vb[..., :1] * ub[..., 1:]
        return self.scatter(lin, jnp.concatenate([head, tail], axis=3))

    def inv(self, u):
        lin = 1.0 / u[:, :, :self.l] if self.l else u[:, :, :0]
        if not self.S:
            return lin
        ub = self.gather(u)
        det = ub[..., 0] ** 2 - jnp.sum(ub[..., 1:] ** 2, axis=3)
        Ju = jnp.concatenate([ub[..., :1], -ub[..., 1:]], axis=3)
        return self.scatter(lin, Ju / det[..., None])

    def min_shift(self, u):
        """Per-scenario max over stages/cones of the interiority defect:
        (B, K, mc) -> (B, 1)."""
        B = u.shape[0]
        parts = [jnp.full((B, 1), -jnp.inf, u.dtype)]
        if self.l:
            parts.append(jnp.max(-u[:, :, :self.l], axis=(1, 2))[:, None])
        if self.S:
            ub = self.gather(u)
            d = jnp.sqrt(jnp.sum(ub[..., 1:] ** 2, axis=3)) - ub[..., 0]
            parts.append(jnp.max(d, axis=(1, 2))[:, None])
        return jnp.max(jnp.concatenate(parts, axis=1), axis=1)[:, None]

    def max_step(self, u, du):
        """Per-scenario boundary step (B, 1); mirrors _BatchCones.max_step."""
        B = u.shape[0]
        dtype = u.dtype
        big = jnp.asarray(1e20, dtype)
        alphas = [jnp.full((B, 1), 1e20, dtype)]
        if self.l:
            un, dn = u[:, :, :self.l], du[:, :, :self.l]
            a = jnp.where(dn < 0, -un / jnp.where(dn < 0, dn, -1.0), big)
            alphas.append(jnp.min(a, axis=(1, 2))[:, None])
        if self.S:
            ub, db = self.gather(u), self.gather(du)
            a2 = db[..., 0] ** 2 - jnp.sum(db[..., 1:] ** 2, axis=3)
            b2 = (ub[..., 0] * db[..., 0]
                  - jnp.sum(ub[..., 1:] * db[..., 1:], axis=3))
            c2 = ub[..., 0] ** 2 - jnp.sum(ub[..., 1:] ** 2, axis=3)
            disc = b2 ** 2 - a2 * c2
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            root_neg_a = (b2 + sq) / jnp.maximum(-a2, 1e-30)
            root_pos_a = jnp.where(
                (disc > 0) & (b2 < 0),
                c2 / jnp.maximum(-b2 + sq, 1e-30), big)
            lin_r = jnp.where(
                b2 < 0, -c2 / (2.0 * jnp.where(b2 < 0, b2, -1.0)), big)
            a_soc = jnp.where(a2 < -1e-30, root_neg_a,
                              jnp.where(a2 > 1e-30, root_pos_a, lin_r))
            head_cap = jnp.where(
                db[..., 0] < 0,
                -ub[..., 0] / jnp.where(db[..., 0] < 0, db[..., 0], -1.0),
                big)
            a_all = jnp.minimum(a_soc, head_cap)
            alphas.append(jnp.min(a_all, axis=(1, 2))[:, None])
        return jnp.min(jnp.concatenate(alphas, axis=1), axis=1)[:, None]

    # ---- NT scaling (structured) ----

    def nt_scaling(self, s, z):
        """Scaling point of (s, z), both (B, K, mc).

        Returns (rep, lam): rep = dict with
          d     (B, K, l)        linear scalings sqrt(s/z)
          u     (B, K, S, qmax)  SOC scaling vectors (W = 2uu' - detu*J)
          detu  (B, K, S)
        """
        dtype = s.dtype
        rep = {}
        lam_lin = s[:, :, :0]
        if self.l:
            sn, zn = s[:, :, :self.l], z[:, :, :self.l]
            rep["d"] = jnp.sqrt(sn / zn)
            lam_lin = jnp.sqrt(sn * zn)
        if self.S:
            sb, zb = self.gather(s), self.gather(z)
            Jrow = self._jrow(dtype)
            det_s = jnp.maximum(
                sb[..., 0] ** 2 - jnp.sum(sb[..., 1:] ** 2, 3), 1e-30)
            det_z = jnp.maximum(
                zb[..., 0] ** 2 - jnp.sum(zb[..., 1:] ** 2, 3), 1e-30)
            sbar = sb / jnp.sqrt(det_s)[..., None]
            zbar = zb / jnp.sqrt(det_z)[..., None]
            gamma = jnp.sqrt(jnp.maximum(
                (1.0 + jnp.sum(sbar * zbar, 3)) / 2.0, 1e-30))
            wbar = (sbar + zbar * Jrow) / (2.0 * gamma[..., None])
            eta = (det_s / det_z) ** 0.25
            wv = eta[..., None] * wbar
            detw = jnp.maximum(
                wv[..., 0] ** 2 - jnp.sum(wv[..., 1:] ** 2, 3), 1e-30)
            sqrt_detw = jnp.sqrt(detw)
            head = self._head(dtype)
            u = (wv + sqrt_detw[..., None] * head) / jnp.sqrt(
                2.0 * (wv[..., 0] + sqrt_detw))[..., None]
            rep["u"] = u
            rep["detu"] = sqrt_detw
            lam_soc = self._apply_soc(u, sqrt_detw, zb)
            lam = self.scatter(lam_lin, lam_soc)
        else:
            lam = lam_lin
        return rep, lam

    def identity_rep(self, B, K, dtype):
        rep = {}
        if self.l:
            rep["d"] = jnp.ones((B, K, self.l), dtype)
        if self.S:
            # W = I: u = e0 (head 1, tail 0), detu = 1 => 2uu' - J = I
            rep["u"] = jnp.broadcast_to(self._head(dtype),
                                        (B, K, self.S, self.qmax))
            rep["detu"] = jnp.ones((B, K, self.S), dtype)
        return rep

    def _apply_soc(self, u, detu, vb):
        """(2 u u' - detu J) vb on gathered blocks (B, K, S, qmax)."""
        uv = jnp.sum(u * vb, axis=3, keepdims=True)
        Jv = jnp.concatenate([vb[..., :1], -vb[..., 1:]], axis=3)
        return 2.0 * u * uv - detu[..., None] * Jv

    def _uinv(self, rep):
        Jrow = self._jrow(rep["u"].dtype)
        return (rep["u"] * Jrow) / rep["detu"][..., None]

    def apply_W(self, rep, v):
        lin = rep["d"] * v[:, :, :self.l] if self.l else v[:, :, :0]
        if not self.S:
            return lin
        return self.scatter(
            lin, self._apply_soc(rep["u"], rep["detu"], self.gather(v)))

    def apply_Winv(self, rep, v):
        lin = v[:, :, :self.l] / rep["d"] if self.l else v[:, :, :0]
        if not self.S:
            return lin
        return self.scatter(
            lin, self._apply_soc(self._uinv(rep), 1.0 / rep["detu"],
                                 self.gather(v)))

    def apply_Winv2(self, rep, v):
        return self.apply_Winv(rep, self.apply_Winv(rep, v))

    def winv_rows(self, rep, Gf, B: int, K: int):
        """W^{-1} applied to the mc ROWS of G: Gf (B*K, mc, C).

        The structured form of _BatchCones.apply_Winv_rows: linear rows
        scale by 1/d; each SOC row block gets (2 uinv uinv' - (1/detu) J).
        """
        C = Gf.shape[-1]
        parts = []
        if self.l:
            dinv = (1.0 / rep["d"]).reshape(B * K, self.l, 1)
            parts.append(Gf[:, :self.l, :] * dinv)
        if self.S:
            uinv = self._uinv(rep)
            for i, (o, q) in enumerate(zip(self.soc_offs, self.soc_sizes)):
                Gc = Gf[:, o:o + q, :]
                ui = uinv[:, :, i, :q].reshape(B * K, q, 1)
                di = rep["detu"][:, :, i].reshape(B * K, 1, 1)
                t = jnp.sum(ui * Gc, axis=1, keepdims=True)   # (BK,1,C)
                JG = jnp.concatenate([Gc[:, :1, :], -Gc[:, 1:, :]], axis=1)
                parts.append(2.0 * ui * t - JG / di)
        return jnp.concatenate(parts, axis=1)
