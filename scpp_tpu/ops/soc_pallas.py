"""Pallas TPU kernel: batched second-order-cone projection.

The per-iteration cone projection of the first-order conic solver
(scpp_tpu/solver/scs.py) projects G stacked SOC blocks (t, z) onto
||z|| <= t. As a Pallas kernel the whole group projects in one fused
VMEM pass — one load, a masked lane reduction for ||z||, the three-case
select, one store — instead of separate gather/norm/where/scatter HLOs.

Layout: blocks (G, q) padded to (G_pad, 128) lanes; grid tiles the cone
axis. Sizes q are static per group (the canonicalizer pads/group-sorts),
so masks are compile-time constants.

Falls back to the jnp implementation off-TPU; correctness is tested in
interpreter mode against the reference implementation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["soc_project_blocks", "soc_project_blocks_reference"]

_TILE_G = 8
_LANES = 128


def soc_project_blocks_reference(blocks):
    """jnp reference: project rows (t, z_1..z_{q-1}) onto the SOC."""
    t = blocks[:, 0]
    z = blocks[:, 1:]
    zn = jnp.linalg.norm(z, axis=1)
    safe = jnp.maximum(zn, 1e-30)
    inside = zn <= t
    below = zn <= -t
    a = 0.5 * (t + zn)
    t_new = jnp.where(inside, t, jnp.where(below, 0.0, a))
    z_scale = jnp.where(inside, 1.0, jnp.where(below, 0.0, a / safe))
    return jnp.concatenate([t_new[:, None], z * z_scale[:, None]], axis=1)


def _soc_kernel(q: int, x_ref, o_ref):
    x = x_ref[:]                        # (TILE_G, LANES)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    is_z = (lane >= 1) & (lane < q)
    t = x[:, 0]
    z_masked = jnp.where(is_z, x, 0.0)
    zn = jnp.sqrt(jnp.sum(z_masked * z_masked, axis=1))
    safe = jnp.maximum(zn, 1e-30)
    inside = zn <= t
    below = zn <= -t
    a = 0.5 * (t + zn)
    t_new = jnp.where(inside, t, jnp.where(below, 0.0, a))
    z_scale = jnp.where(inside, 1.0, jnp.where(below, 0.0, a / safe))
    out = jnp.where(is_z, x * z_scale[:, None], x)
    # lane-0 write via select, NOT out.at[:, 0].set(...): the scatter that
    # .at lowers to is unimplemented in Pallas TPU (it crashed the r02 bench
    # compiled path; interpret=True hid it)
    out = jnp.where(lane == 0, t_new[:, None], out)
    o_ref[:] = out


@partial(jax.jit, static_argnums=(1, 2))
def soc_project_blocks(blocks, q: int = None, interpret: bool = False):
    """Project (G, q) SOC blocks via the Pallas kernel.

    ``q`` defaults to blocks.shape[1]. Pads to TPU tiles internally.
    """
    G, q_in = blocks.shape
    q = q or q_in
    G_pad = max(_TILE_G, -(-G // _TILE_G) * _TILE_G)
    x = jnp.zeros((G_pad, _LANES), blocks.dtype)
    x = x.at[:G, :q].set(blocks[:, :q])

    out = pl.pallas_call(
        partial(_soc_kernel, q),
        out_shape=jax.ShapeDtypeStruct((G_pad, _LANES), blocks.dtype),
        grid=(G_pad // _TILE_G,),
        in_specs=[pl.BlockSpec((_TILE_G, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_TILE_G, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)
    return out[:G, :q]
