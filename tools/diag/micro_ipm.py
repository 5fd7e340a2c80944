"""Micro-benchmark the staged IPM's constituent ops at flagship shapes.

Times, at B=64 x K=30 x w=32/me=16/mc=52 (the bench batch), each building
block of one IPM iteration in isolation: NT scaling, Gram assembly,
CR factorization, CR solve, max_step, residual matvecs. The sum vs the
measured ~8.6 ms/iteration tells where the pass-count bottleneck lives.

Usage: PYTHONPATH=$PYTHONPATH:/root/repo python tools/diag/micro_ipm.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from scpp_tpu.solver.ipm_staged import _BatchCones  # noqa: E402
from scpp_tpu.solver.staged_kkt import (  # noqa: E402
    cr_factor, cr_solve, signed_cholesky)

B, K, w, me, mc = 64, 30, 32, 16, 52
Wp = w + me
C = 2 * w  # stage cols (g=0)
L_NN, SOCS = 30, (5, 3, 3, 4, 4, 3)


def timeit(name, f, *args, n=5):
    out = jax.block_until_ready(f(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:<26} {min(ts)*1e3:8.2f} ms")
    return out


def main():
    rng = np.random.default_rng(0)
    dt = jnp.float32
    with jax.default_matmul_precision("highest"):
        cones = _BatchCones(K, L_NN, SOCS)
        e = jax.vmap(lambda _: cones.e(dt))(jnp.arange(B))  # (B,K,mc)
        s = jnp.asarray(rng.uniform(0.5, 2.0, (B, K, mc)), dt) * e[0]
        s = s + 0.01
        z = jnp.asarray(rng.uniform(0.5, 2.0, (B, K, mc)), dt) * e[0] + 0.01

        nt = jax.jit(jax.vmap(cones.nt_scaling))
        rep, lam = timeit("nt_scaling", nt, s, z)

        G = jnp.asarray(rng.standard_normal((B, K, mc, C)), dt) * 0.3
        A = jnp.asarray(rng.standard_normal((B, K, me, C)), dt) * 0.3

        def gram(rep, G, A):
            Gw = jnp.einsum("bkij,bkjc->bkic", rep["Winv"], G)
            Gw = jnp.concatenate([Gw, A], axis=2)
            return jnp.einsum("bkmc,bkmd->bkcd", Gw, Gw)

        Gam = timeit("gram", jax.jit(gram), rep, G, A)

        def build_D(Gam, A):
            Hxx = Gam[:, :, :w, :w]
            Hnn = Gam[:, :, w:, w:]
            Hxn = Gam[:, :, w:, :w]
            I_w = jnp.eye(w, dtype=dt)
            Dxx = 1e-4 * I_w + Hxx + 1e-2 * jnp.eye(w, dtype=dt)
            Dxx = Dxx.at[:, 1:].add(Hnn[:, :-1])
            Dxy = jnp.swapaxes(A[:, :, :, :w], 2, 3)
            Dyy = jnp.broadcast_to(-1e-4 * jnp.eye(me, dtype=dt), (B, K, me, me))
            D = jnp.concatenate([
                jnp.concatenate([Dxx, Dxy], axis=3),
                jnp.concatenate([jnp.swapaxes(Dxy, 2, 3), Dyy], axis=3)],
                axis=2)
            O = jnp.concatenate([
                jnp.concatenate([Hxn[:, :-1],
                                 jnp.swapaxes(A[:, :-1, :, w:], 2, 3)],
                                axis=3),
                jnp.zeros((B, K - 1, me, Wp), dt)], axis=2)
            # diagonal dominance for a stable test factor
            D = D + 5.0 * jnp.eye(Wp, dtype=dt)
            return D, O

        D, O = timeit("assemble D/O", jax.jit(build_D), Gam, A)

        fact = timeit("cr_factor", jax.jit(jax.vmap(
            lambda D_, O_: cr_factor(D_, O_, w))), D, O)

        b = jnp.asarray(rng.standard_normal((B, K, Wp)), dt)
        # cr_factor's fact carries a static int; time factor+N solves and
        # difference against the factor-only time instead of vmapping fact
        def fs(n):
            def go(D_, O_, b_):
                f_ = cr_factor(D_, O_, w)
                x = b_
                for _ in range(n):
                    x = cr_solve(f_, x)
                return x
            return jax.jit(jax.vmap(go))
        timeit("factor+1 solve", fs(1), D, O, b)
        timeit("factor+6 solves", fs(6), D, O, b)

        du = jnp.asarray(rng.standard_normal((B, K, mc)), dt) * 0.1
        timeit("max_step", jax.jit(jax.vmap(cones.max_step)), s, du)
        timeit("mul", jax.jit(jax.vmap(cones.mul)), s, z)
        timeit("inv", jax.jit(jax.vmap(cones.inv)), s)
        timeit("apply_Winv2", jax.jit(jax.vmap(cones.apply_Winv2)), rep,
               du)

        M = jnp.asarray(rng.standard_normal((B, K, me + mc, C)), dt)
        x = jnp.asarray(rng.standard_normal((B, K, C)), dt)
        timeit("stacked matvec", jax.jit(
            lambda M_, x_: jnp.einsum("bkmc,bkc->bkm", M_, x_)), M, x)

        chol_in = D + 20.0 * jnp.eye(Wp, dtype=dt)
        timeit("signed_cholesky(D)", jax.jit(jax.vmap(
            lambda m: signed_cholesky(m, w))), chol_in)


if __name__ == "__main__":
    main()
