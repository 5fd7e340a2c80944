"""Calibrate in-kernel Pallas op costs on the real chip (round-5 design).

The monolithic IPM kernel (VERDICT r04 #1) needs layout decisions backed
by measurements, not folklore:
  A. elementwise throughput on 3D (B*,48,48) vs flat 2D
  B. a full 48-column right-looking Cholesky sweep in 3D batched layout
     (d = M[:,j,j]; col = M[:,:,j]*rsqrt(d); M -= col x col outer)
  C. batched (n,48,48)@(n,48,48) dot_general (the CR factor's workhorse)
  D. the same flops packed 2-per-128-lane as (n/2,96,96)
  E. FMA-loop matvec: acc(240,64) += A[:,m,:]*v[:,m:m+1] over m=68
  F. VMEM ceiling probe (scratch allocation sizes)

Each kernel runs its op ITERS times inside a fori_loop with a data
dependency; cost = (t_iters - t_zero)/ITERS measured over best-of-5.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 50


def timed(name, fn, *args):
    fn_c = jax.jit(fn)
    out = fn_c(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(fn_c(*args))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"{name:<42} {t*1e3:9.3f} ms total  {t/ITERS*1e6:9.2f} us/iter")
    return t


def run_loop_kernel(name, body, shapes, dtype=jnp.float32):
    """body(refs...) -> carried array; loop ITERS times inside kernel."""
    def kern(*refs):
        in_refs, out_ref = refs[:-1], refs[-1]
        in_vals = [r[:] for r in in_refs]

        def step(i, acc):
            return body(acc, i, *in_vals)

        out_ref[:] = jax.lax.fori_loop(
            0, ITERS, step, jnp.zeros_like(out_ref))

    args = [jnp.asarray(np.random.RandomState(i).rand(*s), dtype)
            for i, s in enumerate(shapes[:-1])]
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(shapes[-1], dtype),
        in_specs=[spec] * len(args),
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    return timed(name, f, *args)


def main():
    print(f"device: {jax.devices()[0]}")
    n, w = 240, 48

    # A. elementwise 3D vs 2D
    run_loop_kernel(
        "A1 elementwise 3D (240,48,48)",
        lambda acc, i, a: acc + a * 1.0001 + acc * a,
        [(n, w, w), (n, w, w)])
    run_loop_kernel(
        "A2 elementwise 2D (11520,48)",
        lambda acc, i, a: acc + a * 1.0001 + acc * a,
        [(n * w, w), (n * w, w)])

    # B. one full 48-column Cholesky-style sweep, 3D batched. Mosaic has
    # no dynamic_slice on non-minor dims -> columns statically unrolled.
    def chol_sweep(acc, i, a):
        M = a + acc
        for j in range(w):
            d = jax.lax.rsqrt(jnp.abs(M[:, j, j]) + 1.0)      # (n,)
            c = M[:, :, j] * d[:, None]                        # (n, w)
            M = M - c[:, :, None] * c[:, None, :]
        return M
    run_loop_kernel("B  48-col chol-style sweep 3D", chol_sweep,
                    [(n, w, w), (n, w, w)])

    # B2. same but only rank-1 on the trailing submatrix via masking
    def chol_sweep_masked(acc, i, a):
        M = a + acc
        colmask = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
        for j in range(w):
            d = jax.lax.rsqrt(jnp.abs(M[:, j, j]) + 1.0)
            c = jnp.where(colmask >= j, M[:, :, j], 0.0) * d[:, None]
            M = M - c[:, :, None] * c[:, None, :]
        return M
    run_loop_kernel("B2 48-col chol sweep 3D masked", chol_sweep_masked,
                    [(n, w, w), (n, w, w)])

    # C. batched matmul (240,48,48)@(240,48,48)
    def bmm(acc, i, a):
        return acc + jax.lax.dot_general(
            a, a + acc, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    run_loop_kernel("C  batched mm (240,48,48)^2", bmm,
                    [(n, w, w), (n, w, w)])

    # D. packed: same flops as (120,96,96) batched
    def bmm96(acc, i, a):
        return acc + jax.lax.dot_general(
            a, a + acc, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    run_loop_kernel("D  batched mm (120,96,96)^2", bmm96,
                    [(n // 2, 2 * w, 2 * w), (n // 2, 2 * w, 2 * w)])

    # D2. single big matmul same-ish flops: (1920, 96) @ (96, 96)
    def mm2d(acc, i, a):
        return acc + jnp.dot(a + acc, a[:96, :],
                             preferred_element_type=jnp.float32)
    run_loop_kernel("D2 2D mm (1920,96)@(96,96)", mm2d,
                    [(1920, 96), (1920, 96)])

    # E. FMA-loop matvec over m=68 planes: 3D-slice form (static unroll)
    def fma_mv_3d(acc, i, a, v):
        out = acc
        for m in range(68):
            out = out + a[:, m, :] * v[:, m][:, None]
        return out
    run_loop_kernel("E1 matvec FMA 3D-slice (240,68,64)", fma_mv_3d,
                    [(n, 68, 64), (n, 68), (n, 64)])

    # E2. same as one reduce: sum over middle axis of (240,68,64)*(240,68,1)
    def mv_reduce(acc, i, a, v):
        return acc + jnp.sum(a * v[:, :, None], axis=1)
    run_loop_kernel("E2 matvec bcast-reduce mid-axis", mv_reduce,
                    [(n, 68, 64), (n, 68), (n, 64)])

    # E3. batched dot_general matvec
    def mv_dot(acc, i, a, v):
        return acc + jax.lax.dot_general(
            a, v + acc, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    run_loop_kernel("E3 matvec batched dot (240,64,68)@(68)", mv_dot,
                    [(n, 64, 68), (n, 68), (n, 64)])

    # E4. transpose-matvec accumulate form: out(240,68)
    def mv_t(acc, i, a, v):
        return acc + jax.lax.dot_general(
            a, v + acc[:, :64], (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, :68]
    run_loop_kernel("E4 matvec batched dot (240,68,64)@(64)", mv_t,
                    [(n, 68, 64), (n, 64), (n, 68)])

    # G. 3D strided middle-index read+write mix (CR bookkeeping shapes)
    def slice_mix(acc, i, a):
        x = a[:, 3, :] + a[:, 7, :]
        return acc.at[:, 5, :].set(x) if hasattr(acc, "at") else acc
    try:
        run_loop_kernel("G  3D mid-index read+set", slice_mix,
                        [(n, w, w), (n, w, w)])
    except Exception as e:
        print("G  3D mid-index read+set FAILED:", type(e).__name__,
              str(e)[:120])

    # F. VMEM probe
    for mb in (24, 48, 96):
        try:
            sz = mb * 1024 * 1024 // 4 // 128

            def kern(o_ref, scratch):
                scratch[0, :] = jnp.ones((128,), jnp.float32)
                o_ref[:] = scratch[0:8, :]
            f = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((sz, 128), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=128 * 1024 * 1024),
            )
            jax.block_until_ready(jax.jit(f)())
            print(f"F  VMEM scratch {mb} MB: OK")
        except Exception as e:
            print(f"F  VMEM scratch {mb} MB: FAILED {type(e).__name__} "
                  + str(e).splitlines()[0][:150])


if __name__ == "__main__":
    main()
