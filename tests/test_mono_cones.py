"""MonoCones (structured kernel cone algebra) vs ipm_staged._BatchCones."""

import jax.numpy as jnp
import numpy as np
import pytest

from scpp_tpu.solver.ipm_staged import _BatchCones
from scpp_tpu.solver.mono_cones import MonoCones

L, SOCS = 7, (5, 3, 4)
K, B = 6, 3
MC = L + sum(SOCS)


def _interior(rng, shape):
    """Strictly interior cone points (B, K, mc)."""
    u = rng.standard_normal(shape + (MC,))
    u[..., :L] = 0.1 + np.abs(u[..., :L])
    off = L
    for q in SOCS:
        tail = u[..., off + 1:off + q]
        u[..., off] = 1.0 + np.sqrt((tail ** 2).sum(-1))
        off += q
    return u


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    s = _interior(rng, (B, K))
    z = _interior(rng, (B, K))
    du = 0.3 * rng.standard_normal((B, K, MC))
    return s, z, du


def test_mul_inv(data):
    s, z, _ = data
    mc = MonoCones(L, SOCS, jnp.float64)
    bc = _BatchCones(K, L, SOCS)
    got = np.asarray(mc.mul(jnp.asarray(s), jnp.asarray(z)))
    want = np.stack([np.asarray(bc.mul(jnp.asarray(s[i]), jnp.asarray(z[i])))
                     for i in range(B)])
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
    got_i = np.asarray(mc.inv(jnp.asarray(s)))
    want_i = np.stack([np.asarray(bc.inv(jnp.asarray(s[i])))
                       for i in range(B)])
    np.testing.assert_allclose(got_i, want_i, rtol=1e-10, atol=1e-12)


def test_min_shift_max_step(data):
    s, _, du = data
    mc = MonoCones(L, SOCS, jnp.float64)
    bc = _BatchCones(K, L, SOCS)
    u = s - 1.2  # make some entries exterior
    got = np.asarray(mc.min_shift(jnp.asarray(u)))[:, 0]
    want = np.array([float(bc.min_shift(jnp.asarray(u[i])))
                     for i in range(B)])
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)

    got_a = np.asarray(mc.max_step(jnp.asarray(s), jnp.asarray(du)))[:, 0]
    want_a = np.array([float(bc.max_step(jnp.asarray(s[i]),
                                         jnp.asarray(du[i])))
                       for i in range(B)])
    np.testing.assert_allclose(got_a, want_a, rtol=1e-9, atol=1e-12)


def test_nt_scaling_applies(data):
    s, z, du = data
    mc = MonoCones(L, SOCS, jnp.float64)
    bc = _BatchCones(K, L, SOCS)
    rep, lam = mc.nt_scaling(jnp.asarray(s), jnp.asarray(z))
    for i in range(B):
        rep_b, lam_b = bc.nt_scaling(jnp.asarray(s[i]), jnp.asarray(z[i]))
        np.testing.assert_allclose(np.asarray(lam)[i], np.asarray(lam_b),
                                   rtol=1e-9, atol=1e-10)
        v = du[i]
        for name, fn_m, fn_b in [
                ("W", mc.apply_W, bc.apply_W),
                ("Winv", mc.apply_Winv, bc.apply_Winv),
                ("Winv2", mc.apply_Winv2, bc.apply_Winv2)]:
            got = np.asarray(fn_m(rep, jnp.asarray(du)))[i]
            want = np.asarray(fn_b(rep_b, jnp.asarray(v)))
            np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-9,
                                       err_msg=name)


def test_winv_rows(data):
    """Row-wise W^{-1} G: slot-broadcast apply on transposed G equals
    the unfused path's dense apply_Winv_rows."""
    s, z, _ = data
    rng = np.random.default_rng(1)
    Gf = rng.standard_normal((B * K, MC, 10))
    mc = MonoCones(L, SOCS, jnp.float64)
    bc = _BatchCones(K, L, SOCS)
    rep, _ = mc.nt_scaling(jnp.asarray(s), jnp.asarray(z))
    GT = jnp.swapaxes(jnp.asarray(Gf), 1, 2)           # (BK, 10, mc)
    gotT = mc.apply_Winv(MonoCones.expand_rep(rep), GT)
    got = np.asarray(jnp.swapaxes(gotT, 1, 2))
    for i in range(B):
        rep_b, _ = bc.nt_scaling(jnp.asarray(s[i]), jnp.asarray(z[i]))
        want = np.asarray(bc.apply_Winv_rows(
            rep_b, jnp.asarray(Gf[i * K:(i + 1) * K])))
        np.testing.assert_allclose(got[i * K:(i + 1) * K], want,
                                   rtol=1e-8, atol=1e-9)


def test_identity_rep(data):
    s, _, _ = data
    mc = MonoCones(L, SOCS, jnp.float64)
    rep = mc.identity_rep(jnp.float64)
    v = jnp.asarray(s)
    np.testing.assert_allclose(np.asarray(mc.apply_W(rep, v)), s,
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(mc.apply_Winv(rep, v)), s,
                               rtol=1e-12, atol=1e-12)
