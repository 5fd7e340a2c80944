"""Per-phase device-time breakdown of one SC/SCvx iteration.

The reference prints wall-clock per phase every iteration
(SCAlgorithm.cpp:69-92,117-128: discretization / solve / defects). A
fully-jitted solve fuses those phases into one XLA program, so the
TPU-native analog times each phase as its own warm jitted function on
the same data — same taxonomy, comparable numbers.

Used by the CLI drivers (--phase-timings) and bench.py.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

__all__ = ["phase_breakdown"]


def phase_breakdown(model, params, cfg, algo: str = "sc", batch: int = 1,
                    printer=print):
    """Time discretize / build+conic-solve / resimulate for one iteration
    of ``algo`` ("sc" | "scvx") at the given scenario ``batch``. Returns
    {phase: ms} (min over 3 warm reps) and prints reference-style lines."""
    from scpp_tpu.algos.common import nonlinear_defect_cost
    from scpp_tpu.algos.staged_problems import (
        build_sc_subproblem_staged, build_scvx_subproblem_staged)
    from scpp_tpu.ops.discretization import multiple_shooting
    from scpp_tpu.solver.ipm_staged import solve_staged_ipm

    if cfg.nondimensionalize:
        params = model.nondimensionalize(params)
    par = model.param_vector(params)
    td = model.init_trajectory(params, cfg.K, cfg.interpolate_input)
    ref = model.constraint_ref(params, td)
    dtype = td.X.dtype
    fft = algo == "sc" and cfg.free_final_time
    tdb = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape), td)

    out = {}

    def timed(name, f, *args):
        r = f(*args)
        jax.block_until_ready(r)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = f(*args)
            jax.block_until_ready(r)
            ts.append(time.perf_counter() - t0)
        out[name] = min(ts) * 1e3
        printer(f"{'Time, %s:' % name:<50}{out[name]:.2f}ms"
                f"  (batch={batch})")
        return r

    disc = jax.jit(jax.vmap(lambda td_: multiple_shooting(
        model, par, td_, substeps=cfg.substeps, method=cfg.integrator,
        variable_time=fft)))
    dd_b = timed("discretization", disc, tdb)

    if algo == "sc":
        weights = (jnp.asarray(cfg.weight_time, dtype),
                   jnp.asarray(cfg.weight_trust_region_time, dtype),
                   jnp.asarray(cfg.weight_trust_region_trajectory, dtype),
                   jnp.asarray(cfg.weight_virtual_control, dtype))

        def one(td_, dd_):
            prog = build_sc_subproblem_staged(model, params, td_, dd_,
                                              weights, ref, fft)
            return solve_staged_ipm(prog, cfg.solver).x_stage
    else:
        def one(td_, dd_):
            prog = build_scvx_subproblem_staged(
                model, params, td_, dd_,
                jnp.asarray(cfg.trust_region, dtype),
                jnp.asarray(cfg.weight_virtual_control, dtype), ref, None)
            return solve_staged_ipm(prog, cfg.solver).x_stage

    timed("solve", jax.jit(jax.vmap(one)), tdb, dd_b)

    resim = jax.jit(jax.vmap(lambda td_: nonlinear_defect_cost(
        model, par, td_, cfg.sim_substeps, cfg.integrator)))
    timed("defects", resim, tdb)
    return out
