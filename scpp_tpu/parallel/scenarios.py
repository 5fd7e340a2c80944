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


def disperse_initial_state(model, params, key, n: int, scale):
    """Sample ``n`` scenario parameter pytrees with *feasible* dispersed
    initial states via the model's ``disperse_x_init`` hook (the batched
    analog of the reference's commented-out randomizeInitialState,
    rocketQuat.cpp:203-227). Feasibility matters: the initial node is
    pinned by an equality constraint, so an x_init outside the hard state
    set (tilt/rate boxes, glideslope cone) would make every subproblem of
    that scenario infeasible."""
    keys = jax.random.split(key, n)

    def one(k):
        return params.replace(x_init=model.disperse_x_init(params, k, scale))

    return jax.vmap(one)(keys)


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
