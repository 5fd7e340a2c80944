"""Isolate the flagship mono-kernel compile hang: compile partial
kernels (init only / one iteration / while-wrapped) at flagship shapes.
Usage: python - < tools/diag/mono_parts.py  (PART=init|iter1|while2|full)
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scpp_tpu.solver.ipm import IPMSettings
from scpp_tpu.solver import ipm_mono as M

PART = os.environ.get("PART", "init")
B, K, w, me, l = 16, 30, 32, 16, 30
socs = (5, 3, 3, 4, 4, 3)
mc = l + sum(socs)
SET = IPMSettings(iters=int(os.environ.get("ITERS", "6")),
                  eps_reg=1e-4, eps_feas=1e-4, refine_steps=0)
statics = (K, w, me, l, socs, SET)

rng = np.random.RandomState(0)
shapes = [(B, K, 2 * w, me), (B, K, 2 * w, mc), (B, K, me), (B, K, mc),
          (B, K, w), (B, K, me), (B, K, mc), (B, K, w), (B, 1, 4),
          (B, K, w), (B, K, me), (B, K, mc)]
args = [jnp.asarray(rng.rand(*s).astype(np.float32)) for s in shapes]


def kern(statics, part, *refs):
    ins = refs[:12]
    outs = refs[12:]
    vals = [r[:] for r in ins]
    x, y, s, z, diag = M._solve_block(statics, *vals, part=part)
    outs[0][:] = x
    outs[1][:] = y
    outs[2][:] = s
    outs[3][:] = z
    outs[4][:] = diag


from functools import partial

out_shapes = [(K, w), (K, me), (K, mc), (K, mc), (1, 4)]
spec = pl.BlockSpec(memory_space=pltpu.VMEM)
f = pl.pallas_call(
    partial(kern, statics, PART),
    out_shape=[jax.ShapeDtypeStruct((B,) + s, jnp.float32)
               for s in out_shapes],
    in_specs=[spec] * 12,
    out_specs=[spec] * 5,
    compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=120 * 1024 * 1024),
)

print(f"PART={PART} compiling...", flush=True)
t0 = time.perf_counter()
out = jax.jit(f)(*args)
jax.block_until_ready(out)
print(f"PART={PART} compile+run {time.perf_counter()-t0:.1f}s", flush=True)
