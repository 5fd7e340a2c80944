"""Fused Pallas cyclic-reduction solve vs staged_kkt.cr_solve.

Interpreter-mode equivalence on random quasidefinite block-tridiagonal
systems (the compiled path runs in the TPU smoke suite, tests/
test_tpu_smoke.py — the r02 lesson says interpret-only coverage can hide
Mosaic lowering failures)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpp_tpu.solver.cr_pallas import cr_pack, cr_solve_fused
from scpp_tpu.solver.staged_kkt import cr_factor, cr_solve

from test_staged_kkt import _quasidefinite_blocks


@pytest.fixture(autouse=True)
def _full_precision():
    with jax.default_matmul_precision("highest"):
        yield


@pytest.mark.parametrize("K,p,q", [(4, 3, 2), (7, 5, 3), (8, 6, 3),
                                   (30, 32, 16)])
def test_fused_matches_cr_solve(K, p, q):
    if K == 30:
        # flagship shape: sanity only at reduced p/q for CPU runtime
        p, q = 6, 3
    rng = np.random.default_rng(K * 17 + p)
    dense, D, O, _, _ = _quasidefinite_blocks(rng, K, p, q)
    w = p + q
    b = rng.standard_normal((K, w))

    fact = cr_factor(jnp.asarray(D), jnp.asarray(O), p)
    x_ref = np.asarray(cr_solve(fact, jnp.asarray(b)))
    packed, p_out = cr_pack(fact, K)
    x_fused = np.asarray(cr_solve_fused(packed, jnp.asarray(b), p_out,
                                        interpret=True))
    np.testing.assert_allclose(x_fused, x_ref, rtol=1e-9, atol=1e-9)
    # and against the dense oracle
    x_dense = np.linalg.solve(dense, b.ravel()).reshape(K, w)
    np.testing.assert_allclose(x_fused, x_dense, atol=1e-7)


def test_fused_vmaps():
    """The kernel must batch under vmap (the IPM runs vmapped over
    scenarios)."""
    K, p, q = 6, 4, 2
    rng = np.random.default_rng(0)
    facts, bs = [], []
    for i in range(3):
        _, D, O, _, _ = _quasidefinite_blocks(
            np.random.default_rng(i), K, p, q)
        facts.append(cr_factor(jnp.asarray(D), jnp.asarray(O), p))
        bs.append(rng.standard_normal((K, p + q)))
    packs = [cr_pack(f, K)[0] for f in facts]
    packed_b = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *packs)
    b_b = jnp.asarray(np.stack(bs))

    out = jax.vmap(lambda pk, b: cr_solve_fused(pk, b, p, True))(
        packed_b, b_b)
    for i in range(3):
        ref = cr_solve(facts[i], b_b[i])
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(ref),
                                   rtol=1e-9, atol=1e-9)


def test_kkt_fused_end_to_end():
    """solve_staged_ipm(kkt_fused=True) equals the unfused solver on a
    stage-banded SOCP (advisor r04: no e2e coverage existed). Runs the
    interpreter path here; the compiled path is exercised by the TPU
    smoke suite."""
    from scpp_tpu.solver.ipm import IPMSettings
    from scpp_tpu.solver.ipm_staged import solve_staged_ipm
    from tests.test_ipm_mono import _random_prog

    prog = _random_prog(3)
    s = IPMSettings(iters=30, eps_reg=1e-8, eps_feas=1e-8, refine_steps=1)
    ref = solve_staged_ipm(prog, s)
    got = solve_staged_ipm(prog, s.replace(kkt_fused=True))
    assert float(got.res_pri) < 1e-7
    np.testing.assert_allclose(float(got.obj), float(ref.obj),
                               rtol=1e-7, atol=1e-9)
