"""Single-construct Mosaic probes (each behind a flag, run separately)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

spec = pl.BlockSpec(memory_space=pltpu.VMEM)
CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def bench(name, kern, args, out_shape, iters_in_kernel=1):
    f = jax.jit(pl.pallas_call(
        kern, out_shape=out_shape, in_specs=[spec] * len(args),
        out_specs=spec, compiler_params=CP))
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    tc = time.perf_counter() - t0
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:<44} compile {tc:6.1f}s  run "
          f"{min(ts)/iters_in_kernel*1e6:9.2f} us")
    return out


n, w = 240, 48
rng = np.random.RandomState(0)
which = sys.argv[1]

if which == "rank1":
    # one 3D rank-1 outer-product update step, looped 50x via fori
    def kern(a_ref, o_ref):
        a = a_ref[:]

        def step(i, M):
            c = M[:, :, 0] * 1e-3
            return M - c[:, :, None] * c[:, None, :]
        o_ref[:] = jax.lax.fori_loop(0, 50, step, a)
    bench("rank1 3D outer (240,48,48), 50 steps", kern,
          [jnp.asarray(rng.rand(n, w, w), jnp.float32)],
          jax.ShapeDtypeStruct((n, w, w), jnp.float32), 50)

elif which == "bdot":
    def kern(a_ref, o_ref):
        a = a_ref[:]

        def step(i, acc):
            return acc + jax.lax.dot_general(
                a, a + acc * 1e-6, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        o_ref[:] = jax.lax.fori_loop(0, 50, step, jnp.zeros_like(a))
    bench("batched dot (240,48,48)^2, 50 steps", kern,
          [jnp.asarray(rng.rand(n, w, w), jnp.float32)],
          jax.ShapeDtypeStruct((n, w, w), jnp.float32), 50)

elif which == "bdot96":
    def kern(a_ref, o_ref):
        a = a_ref[:]

        def step(i, acc):
            return acc + jax.lax.dot_general(
                a, a + acc * 1e-6, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        o_ref[:] = jax.lax.fori_loop(0, 50, step, jnp.zeros_like(a))
    bench("batched dot (120,96,96)^2, 50 steps", kern,
          [jnp.asarray(rng.rand(n // 2, 96, 96), jnp.float32)],
          jax.ShapeDtypeStruct((n // 2, 96, 96), jnp.float32), 50)

elif which == "reshape88":
    def kern(a_ref, o_ref):
        a = a_ref[:]                       # (240, 8, 8)
        flat = a.reshape(n, 64)
        o_ref[:] = (flat + 1.0).reshape(n, 8, 8)
    bench("reshape (240,8,8)<->(240,64)", kern,
          [jnp.asarray(rng.rand(n, 8, 8), jnp.float32)],
          jax.ShapeDtypeStruct((n, 8, 8), jnp.float32))

elif which == "chol8flat":
    # lane-flattened chol8: M (nb, 64); uses tile + matmul-repeat
    E8 = np.zeros((8, 64), np.float32)
    for i in range(8):
        E8[i, i * 8:(i + 1) * 8] = 0.0
        E8[i, i * 8 + np.arange(8) * 0] = 0.0
    # repeat-each-8: out[:, i*8+j] = c[:, i]
    E_each = np.zeros((8, 64), np.float32)
    for i in range(8):
        E_each[i, i * 8:(i + 1) * 8] = 1.0
    # tile-8: out[:, i*8+j] = c[:, j]
    E_tile = np.zeros((8, 64), np.float32)
    for j in range(8):
        E_tile[j, np.arange(8) * 8 + j] = 1.0

    def kern(a_ref, e1_ref, e2_ref, o_ref):
        M0 = a_ref[:]
        e_each, e_tile = e1_ref[:], e2_ref[:]

        def step(it, M):
            Mc = M + M0 * 1e-6
            for j in range(8):
                d = jax.lax.rsqrt(jnp.abs(Mc[:, j * 8 + j:j * 8 + j + 1])
                                  + 1.0)
                r = Mc[:, j * 8:(j + 1) * 8] * d          # (nb, 8)
                o1 = jnp.dot(r, e_each,
                             preferred_element_type=jnp.float32)
                o2 = jnp.dot(r, e_tile,
                             preferred_element_type=jnp.float32)
                Mc = Mc - o1 * o2
            return Mc
        o_ref[:] = jax.lax.fori_loop(0, 20, step, jnp.zeros_like(M0))
    bench("chol8 lane-flat (240,64), 20x8 cols", kern,
          [jnp.asarray(rng.rand(n, 64), jnp.float32),
           jnp.asarray(E_each), jnp.asarray(E_tile)],
          jax.ShapeDtypeStruct((n, 64), jnp.float32), 20)

elif which == "matvec":
    def kern(a_ref, v_ref, o_ref):
        a, v = a_ref[:], v_ref[:]

        def step(it, acc):
            out = acc * 1e-6
            for m in range(68):
                out = out + a[:, m, :] * v[:, m][:, None]
            return out
        o_ref[:] = jax.lax.fori_loop(0, 20, step, jnp.zeros((n, 64),
                                                            jnp.float32))
    bench("matvec FMA 3D static (240,68,64), 20x", kern,
          [jnp.asarray(rng.rand(n, 68, 64), jnp.float32),
           jnp.asarray(rng.rand(n, 68), jnp.float32)],
          jax.ShapeDtypeStruct((n, 64), jnp.float32), 20)

elif which == "matvecdot":
    def kern(a_ref, v_ref, o_ref):
        a, v = a_ref[:], v_ref[:]

        def step(it, acc):
            return acc * 1e-6 + jax.lax.dot_general(
                a, v + acc[:, :68] * 0.0, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        o_ref[:] = jax.lax.fori_loop(0, 20, step,
                                     jnp.zeros((n, 64), jnp.float32))
    bench("matvec batched-dot (240,64,68)@(240,68), 20x", kern,
          [jnp.asarray(rng.rand(n, 64, 68), jnp.float32),
           jnp.asarray(rng.rand(n, 68), jnp.float32)],
          jax.ShapeDtypeStruct((n, 64), jnp.float32), 20)

elif which == "matvecred":
    def kern(a_ref, v_ref, o_ref):
        a, v = a_ref[:], v_ref[:]

        def step(it, acc):
            return acc * 1e-6 + jnp.sum(a * v[:, :, None], axis=1)
        o_ref[:] = jax.lax.fori_loop(0, 20, step,
                                     jnp.zeros((n, 64), jnp.float32))
    bench("matvec bcast+mid-reduce (240,68,64), 20x", kern,
          [jnp.asarray(rng.rand(n, 68, 64), jnp.float32),
           jnp.asarray(rng.rand(n, 68), jnp.float32)],
          jax.ShapeDtypeStruct((n, 64), jnp.float32), 20)

elif which == "transpose":
    def kern(a_ref, o_ref):
        a = a_ref[:]

        def step(it, acc):
            return acc * 1e-6 + jnp.swapaxes(a + acc * 1e-6, 1, 2)
        o_ref[:] = jax.lax.fori_loop(0, 50, step, jnp.zeros_like(a))
    bench("batched transpose (240,48,48), 50x", kern,
          [jnp.asarray(rng.rand(n, w, w), jnp.float32)],
          jax.ShapeDtypeStruct((n, w, w), jnp.float32), 50)
