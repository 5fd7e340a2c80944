"""Monolithic (fused Pallas) staged IPM vs the unfused staged solver.

Runs the identical kernel code path in interpreter mode on CPU (f64),
on synthetic bounded stage-banded SOCPs with known-feasible data.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpp_tpu.solver.ipm import IPMSettings
from scpp_tpu.solver.ipm_mono import mono_supported, solve_staged_ipm_mono
from scpp_tpu.solver.ipm_staged import solve_staged_ipm
from scpp_tpu.solver.staged import StagedProgram

K, W, ME, L = 6, 8, 8, 5
SOCS = (3, 4)
MC = L + sum(SOCS)

SET = IPMSettings(iters=30, eps_reg=1e-8, eps_feas=1e-8, refine_steps=1)


def _random_prog(seed, dtype=jnp.float64):
    """Bounded, strictly feasible stage-banded SOCP."""
    rng = np.random.default_rng(seed)
    A = 0.5 * rng.standard_normal((K, ME, 2 * W))
    A[-1, :, W:] = 0.0                    # last stage has no next block
    G_rand = 0.4 * rng.standard_normal((K, MC, 2 * W))
    G_rand[-1, :, W:] = 0.0
    x0 = rng.standard_normal((K, W))
    # b = A x (stage-coupled), h = G x + s0 with s0 interior
    xc = np.concatenate(
        [x0, np.concatenate([x0[1:], np.zeros((1, W))], 0)], axis=1)
    b = np.einsum("kmc,kc->km", A, xc)
    s0 = rng.standard_normal((K, MC))
    s0[:, :L] = 1.0 + np.abs(s0[:, :L])
    off = L
    for q in SOCS:
        tail = s0[:, off + 1:off + q]
        s0[:, off] = 1.0 + np.sqrt((tail ** 2).sum(-1))
        off += q
    h = np.einsum("kmc,kc->km", G_rand, xc) + s0
    c = 0.3 * rng.standard_normal((K, W))
    return StagedProgram(
        A_eq=jnp.asarray(A, dtype), b_eq=jnp.asarray(b, dtype),
        G=jnp.asarray(G_rand, dtype), h=jnp.asarray(h, dtype),
        A_geq=jnp.zeros((0, 0), dtype), b_geq=jnp.zeros((0,), dtype),
        G_g=jnp.zeros((0, 0), dtype), h_g=jnp.zeros((0,), dtype),
        c_stage=jnp.asarray(c, dtype), c_glob=jnp.zeros((0,), dtype),
        K=K, w=W, g=0, l=L, soc_sizes=SOCS, l_g=0, soc_sizes_g=(),
        stage_layout=(("x", 0, W, K),), glob_layout=())


def test_supported():
    prog = _random_prog(0)
    assert mono_supported(prog, SET)
    assert not mono_supported(prog, SET.replace(refine_f64=True))
    assert not mono_supported(prog, SET.replace(kkt_precision="default"))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mono_matches_unfused(seed):
    prog = _random_prog(seed)
    ref = solve_staged_ipm(prog, SET)
    got = solve_staged_ipm_mono(prog, SET, interpret=True)
    # both converge to tight optima on these well-conditioned problems
    assert float(got.res_pri) < 1e-7
    assert float(got.res_dua) < 1e-7
    assert float(got.res_gap) < 5e-6
    np.testing.assert_allclose(float(got.obj), float(ref.obj),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(got.x_stage),
                               np.asarray(ref.x_stage),
                               rtol=1e-4, atol=1e-6)


def test_mono_vmapped_batch():
    """The custom_vmap rule: one fused kernel over the whole batch."""
    progs = [_random_prog(s) for s in range(4)]
    batched = jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls), *progs)

    res = jax.jit(jax.vmap(
        lambda p: solve_staged_ipm_mono(p, SET, interpret=True)))(batched)
    for i in range(4):
        ref = solve_staged_ipm(progs[i], SET)
        np.testing.assert_allclose(float(res.obj[i]), float(ref.obj),
                                   rtol=1e-6, atol=1e-8)
        assert float(res.res_pri[i]) < 1e-6


def test_mono_warm_start():
    """Warm-started re-solve on perturbed data converges and matches."""
    prog = _random_prog(5)
    first = solve_staged_ipm_mono(prog, SET, interpret=True)
    prog2 = prog.replace(h=prog.h * 1.01, b_eq=prog.b_eq * 0.99)
    warm = solve_staged_ipm_mono(prog2, SET, warm=first,
                                 warm_ok=jnp.asarray(True),
                                 interpret=True)
    ref = solve_staged_ipm(prog2, SET)
    np.testing.assert_allclose(float(warm.obj), float(ref.obj),
                               rtol=1e-6, atol=1e-8)
    assert float(warm.res_pri) < 1e-7


def test_scvx_monolith_end_to_end():
    """solve_scvx with IPMSettings(monolith=True) routes through the
    fused kernel (interpreter off-TPU) and lands on the same trajectory
    class as the unfused path: both converge, costs agree loosely (the
    accept/reject cascade is reassociation-sensitive; answer-quality
    parity is cost-level, see test_goldens drift note)."""
    from scpp_tpu.algos.scvx import solve_scvx
    from scpp_tpu.configs.algorithms import SCvxConfig
    from scpp_tpu.models import Rocket2D

    import dataclasses

    p = Rocket2D.default_params().replace(final_time=jnp.asarray(16.0))
    base = SCvxConfig(K=10, max_iterations=6, solve_budget=8,
                      nondimensionalize=True,
                      solver=IPMSettings(iters=20))
    ref = solve_scvx(Rocket2D, p, base)
    mono = solve_scvx(Rocket2D, p, dataclasses.replace(
        base, solver=base.solver.replace(monolith=True)))
    assert bool(mono.converged) == bool(ref.converged)
    J_ref = float(ref.nonlinear_cost[-1])
    J_mono = float(mono.nonlinear_cost[-1])
    assert abs(J_mono - J_ref) < 0.1 * (1.0 + abs(J_ref)), (J_mono, J_ref)
    np.testing.assert_allclose(np.asarray(mono.td.U),
                               np.asarray(ref.td.U), rtol=0.2, atol=0.5)
