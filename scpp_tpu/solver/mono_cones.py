"""Slot-broadcast Jordan-algebra / NT-scaling ops for the monolithic kernel.

Mirrors solver/ipm_staged._BatchCones numerically, re-designed for what
Mosaic TPU actually lowers: every cone tensor stays in the flat
``(..., mc)`` lane layout end-to-end (no gathered (S, qmax) blocks —
stacking differently-offset lane slices and lane-split reshapes are both
unsupported), and the only non-elementwise primitive is ``seg``: the
same-cone sum broadcast, computed as one matmul against a 0/1 indicator
matrix built from broadcasted_iota (pallas kernels may not capture
numpy constants).

Per-cone quantities (determinants, NT vectors, step-length roots) are
therefore *slot-broadcast*: stored at every lane of their cone. The
algebra is identical to the padded-block form — a cone's head value is
``hb(v) = seg(v * head)``, its tail norm is ``seg(v^2 * tail)``, etc.

All ops accept any leading shape ``(..., mc)``; the IPM uses (B, K, mc)
for iterates and (B*K, 2w, mc) for the row-wise W^{-1} G application
(the scaling rep broadcast over the row axis), which replaces the
unfused path's dense (mc, mc) scaling matrices entirely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["MonoCones"]

_HI = jax.lax.Precision.HIGHEST


class MonoCones:
    """Static cone layout [nonneg (l) | SOC q_1 | ... | SOC q_S].

    Construct INSIDE the kernel (or trace) that uses it: the masks are
    jnp values built from iota at construction.
    """

    def __init__(self, l: int, soc_sizes, dtype=jnp.float32):
        self.l = int(l)
        self.soc_sizes = tuple(int(q) for q in soc_sizes)
        self.mc = self.l + sum(self.soc_sizes)
        self.S = len(self.soc_sizes)
        offs, off = [], self.l
        for q in self.soc_sizes:
            offs.append(off)
            off += q
        self.soc_offs = tuple(offs)
        self.deg_per_stage = self.l + self.S
        self.dtype = dtype

        mc = self.mc
        i_row = jax.lax.broadcasted_iota(jnp.int32, (1, 1, mc), 2)
        one = jnp.ones((1, 1, mc), dtype)
        zero = jnp.zeros((1, 1, mc), dtype)
        self.lin = jnp.where(i_row < self.l, one, zero)
        self.soc = 1.0 - self.lin
        head = zero
        for o in self.soc_offs:
            head = jnp.where(i_row == o, one, head)
        self.head = head
        self.tail = self.soc - head
        self.J = self.lin + head - self.tail   # +1 lin/head, -1 tails
        self.e = self.lin + head               # cone identity element

        # cone id per slot (0 for all linear slots, 1..S for SOCs) and
        # the same-cone indicator csum[i, j] = [cone(i) == cone(j) >= 1]
        cid = jnp.zeros((1, 1, mc), jnp.int32)
        for o in self.soc_offs:
            cid = cid + (i_row >= o).astype(jnp.int32)
        ci = cid.reshape(mc, 1)
        cj = cid.reshape(1, mc)
        soc_i = self.soc.reshape(mc, 1)
        self.csum = ((ci == cj).astype(dtype)
                     * soc_i * self.soc.reshape(1, mc))       # (mc, mc)

    # ---- primitives ----

    def seg(self, v):
        """Same-cone sum broadcast over the last axis (soc slots only)."""
        mc = self.mc
        flat = v.reshape(-1, mc)
        out = jnp.dot(flat, self.csum, precision=_HI,
                      preferred_element_type=v.dtype)
        return out.reshape(v.shape)

    def hb(self, v):
        """Every slot reads its cone's head value."""
        return self.seg(v * self.head)

    @staticmethod
    def _safe(cond, d):
        """Denominator guard: 1 where the branch is not taken (a where
        AFTER the division would still propagate the untaken-branch
        inf/nan)."""
        return jnp.where(cond > 0.5, d, 1.0)

    # ---- Jordan algebra (mirrors _BatchCones) ----

    def mul(self, u, v):
        prod_lin = u * v
        s = self.seg(self.soc * u * v)
        t = self.hb(u) * v + self.hb(v) * u
        return (self.lin * prod_lin + self.head * s + self.tail * t)

    def det(self, u):
        """Per-cone det u0^2 - ||u_tail||^2, slot-broadcast."""
        return self.seg(self.soc * self.J * u * u)

    def inv(self, u):
        d = self._safe(self.soc, self.det(u))
        u_lin = self._safe(self.lin, u)
        return jnp.where(self.lin > 0.5, 1.0 / u_lin, self.J * u / d)

    def min_shift(self, u):
        """(B, K, mc) -> (B, 1) per-scenario interiority defect max."""
        tail_n = jnp.sqrt(jnp.maximum(self.seg(self.tail * u * u), 0.0))
        d_soc = tail_n - self.hb(u)
        val = jnp.where(self.lin > 0.5, -u,
                        jnp.where(self.soc > 0.5, d_soc, -jnp.inf))
        return jnp.max(jnp.max(val, axis=2), axis=1, keepdims=True)

    def max_step(self, u, du):
        """(B, K, mc) x2 -> (B, 1); mirrors _BatchCones.max_step."""
        dtype = u.dtype
        big = jnp.asarray(1e20, dtype)
        # linear slots
        a_lin = jnp.where(du < 0,
                          -u / jnp.where(du < 0, du, -1.0), big)
        # SOC slots (slot-broadcast per-cone quadratic roots)
        a2 = self.seg(self.soc * self.J * du * du)
        b2 = self.seg(self.soc * self.J * u * du)
        c2 = self.det(u)
        disc = b2 ** 2 - a2 * c2
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        root_neg_a = (b2 + sq) / jnp.maximum(-a2, 1e-30)
        root_pos_a = jnp.where((disc > 0) & (b2 < 0),
                               c2 / jnp.maximum(-b2 + sq, 1e-30), big)
        lin_r = jnp.where(b2 < 0,
                          -c2 / (2.0 * jnp.where(b2 < 0, b2, -1.0)), big)
        a_soc = jnp.where(a2 < -1e-30, root_neg_a,
                          jnp.where(a2 > 1e-30, root_pos_a, lin_r))
        u0, du0 = self.hb(u), self.hb(du)
        head_cap = jnp.where(du0 < 0,
                             -u0 / jnp.where(du0 < 0, du0, -1.0), big)
        val = jnp.where(self.lin > 0.5, a_lin,
                        jnp.where(self.soc > 0.5,
                                  jnp.minimum(a_soc, head_cap), big))
        m = jnp.min(jnp.min(val, axis=2), axis=1, keepdims=True)
        return jnp.minimum(m, big)

    # ---- NT scaling (slot-broadcast structured rep) ----

    def nt_scaling(self, s, z):
        """Returns (rep, lam); rep = {d, u, detu} all (..., mc)
        slot-broadcast (d meaningful on linear slots, u/detu on SOCs)."""
        lin, soc, head, J = self.lin, self.soc, self.head, self.J
        dets = jnp.maximum(self.det(s), 1e-30)
        detz = jnp.maximum(self.det(z), 1e-30)
        sbar = s / jnp.sqrt(self._safe(soc, dets))
        zbar = z / jnp.sqrt(self._safe(soc, detz))
        szdot = self.seg(soc * sbar * zbar)
        gamma = jnp.sqrt(jnp.maximum((1.0 + szdot) / 2.0, 1e-30))
        wbar = (sbar + J * zbar) / (2.0 * gamma)
        eta = (dets / detz) ** 0.25
        wv = eta * wbar
        detw = jnp.maximum(self.det(wv), 1e-30)
        sqrt_detw = jnp.sqrt(detw)
        wv0 = self.hb(wv)
        denom = jnp.sqrt(jnp.maximum(2.0 * (wv0 + sqrt_detw), 1e-30))
        u = (wv + sqrt_detw * head) / self._safe(soc, denom)

        z_lin = self._safe(lin, z)
        d = jnp.sqrt(jnp.maximum(s * z_lin, 0.0)) / z_lin   # sqrt(s/z)
        rep = {"d": d, "u": u, "detu": sqrt_detw}
        lam_lin = jnp.sqrt(jnp.maximum(s * z, 0.0))
        lam_soc = 2.0 * u * self.seg(soc * u * z) - sqrt_detw * (J * z)
        lam = jnp.where(lin > 0.5, lam_lin, lam_soc)
        return rep, lam

    def identity_rep(self, dtype):
        return {"d": jnp.ones((1, 1, self.mc), dtype),
                "u": self.head.astype(dtype),
                "detu": jnp.ones((1, 1, self.mc), dtype)}

    def apply_W(self, rep, v):
        soc, lin, J = self.soc, self.lin, self.J
        w_soc = (2.0 * rep["u"] * self.seg(soc * rep["u"] * v)
                 - rep["detu"] * (J * v))
        return jnp.where(lin > 0.5, rep["d"] * v, w_soc)

    def apply_Winv(self, rep, v):
        soc, lin, J = self.soc, self.lin, self.J
        detu = self._safe(soc, rep["detu"])
        uinv = J * rep["u"] / detu
        w_soc = (2.0 * uinv * self.seg(soc * uinv * v)
                 - (J * v) / detu)
        d = self._safe(lin, rep["d"])
        return jnp.where(lin > 0.5, v / d, w_soc)

    def apply_Winv2(self, rep, v):
        return self.apply_Winv(rep, self.apply_Winv(rep, v))

    @staticmethod
    def expand_rep(rep):
        """(B, K, mc) rep -> (B*K, 1, mc) for row-wise application on
        (B*K, rows, mc) tensors."""
        def ex(t):
            B, K, mc = t.shape
            return t.reshape(B * K, 1, mc)
        return {k: ex(v) for k, v in rep.items()}
