"""Scenario parallelism: batched solves sharded over a TPU mesh.

The reference is single-threaded and single-process (SURVEY §2: no
parallelism of any kind); this module is the new design surface that the
TPU build adds. The axes:

  - *scenario batching* (the data-parallel axis): ``vmap`` of a whole
    SC/SCvx solve over dispersed parameters (initial states, mass/thrust
    dispersions). Per-scenario solves are independent, so batching is
    exact — lockstep masked iteration preserves per-scenario results.
  - *cross-chip sharding*: the scenario axis is sharded over an ICI mesh
    with ``shard_map``; convergence statistics are reduced with psum-style
    collectives. No inner-loop communication crosses chips — solves are
    embarrassingly parallel, so scaling is linear by construction.
  - *node parallelism* lives inside each solve already (the vmapped
    multiple-shooting over K-1 intervals and the batched dense conic
    linear algebra).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scpp_tpu.algos.sc import solve_sc
from scpp_tpu.algos.scvx import solve_scvx

__all__ = ["make_scenario_mesh", "disperse_initial_state", "solve_batch",
           "batch_summary"]

_SOLVERS = {"sc": solve_sc, "scvx": solve_scvx}


def make_scenario_mesh(devices=None, axis: str = "scenario") -> Mesh:
    """A 1-D device mesh over the scenario axis."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def disperse_initial_state(params, key, n: int, scale):
    """Sample ``n`` scenario parameter pytrees with Gaussian dispersions on
    the initial state: x_init_i = x_init + scale * eps_i (the batched
    analog of the reference's commented-out randomizeInitialState,
    rocketQuat.cpp:203-227)."""
    eps = jax.random.normal(key, (n,) + params.x_init.shape,
                            dtype=params.x_init.dtype)
    scale = jnp.asarray(scale, params.x_init.dtype)
    x_inits = params.x_init[None, :] + scale * eps

    def with_x(x0):
        return params.replace(x_init=x0)

    return jax.vmap(with_x)(x_inits)


def solve_batch(model, params_batch, cfg, algorithm: str = "scvx",
                mesh: Mesh = None, axis: str = "scenario"):
    """Solve a batch of scenarios; optionally shard over a mesh.

    ``params_batch`` is a params pytree with a leading scenario axis
    (e.g. from :func:`disperse_initial_state`). With a mesh, the batch
    must divide evenly across devices; each device runs its shard in
    lockstep and only the final results are resharded.
    """
    solver = _SOLVERS[algorithm]

    def solve_many(pb):
        return jax.vmap(lambda p: solver(model, p, cfg))(pb)

    if mesh is None:
        return jax.jit(solve_many)(params_batch)

    spec = P(axis)
    shard = jax.shard_map(solve_many, mesh=mesh,
                          in_specs=spec, out_specs=spec, check_vma=False)
    # place inputs according to the mesh before dispatch
    sharding = NamedSharding(mesh, spec)
    params_batch = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), params_batch)
    return jax.jit(shard)(params_batch)


def batch_summary(result):
    """Cross-scenario convergence statistics (the psum-style reduction the
    driver loop would run on-device)."""
    conv = jnp.asarray(result.converged)
    return {
        "n": conv.shape[0],
        "converged": int(jnp.sum(conv)),
        "iterations_mean": float(jnp.mean(jnp.asarray(result.iterations))),
        "max_residual": float(jnp.max(jnp.asarray(result.max_residual))),
    }
