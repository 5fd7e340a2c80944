"""Headline benchmark: batched RocketQuat K=30 SCvx solves/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The north-star target (BASELINE.json) is >= 1000 concurrent RocketQuat
K=30 SCvx solves/s on a v5e-16, i.e. 62.5 solves/s/chip — ``vs_baseline``
is measured throughput relative to that per-chip target. Each "solve" is
a full stock-budget SCvx run (30 accepted iterations / 45 subproblem
budget, SCvx.info parity) over dispersed initial states, run entirely
on-device in float32 with the batched dense IPM backend.

Environment knobs: BENCH_BATCH (default 16), BENCH_BUDGET (default stock
45), BENCH_REPEATS (default 3).
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402


def main():
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    budget = int(os.environ.get("BENCH_BUDGET", "45"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))

    from scpp_tpu.algos.scvx import solve_scvx
    from scpp_tpu.configs.algorithms import SCvxConfig
    from scpp_tpu.models import RocketQuat
    from scpp_tpu.parallel.scenarios import disperse_initial_state
    from scpp_tpu.solver.ipm import IPMSettings

    # stock RocketQuat SCvx.info parameters; fp32-tuned IPM
    cfg = SCvxConfig(
        K=30, max_iterations=30, solve_budget=budget,
        change_threshold=1e-3, nondimensionalize=True,
        substeps=6, sim_substeps=8, state_trust_region=5.0,
        # fp32-tuned: eps_reg is *relative* (Jacobi-equilibrated KKT) and
        # must sit above fp32 matmul roundoff (~n*eps_f32); residuals are
        # polished by iterative refinement; 1e-4 feasibility is ample for
        # SCvx ratio tests (trajectory parity target is 1e-3)
        solver=IPMSettings(iters=25, eps_reg=1e-4, eps_feas=1e-4,
                           refine_steps=2),
    )
    params = RocketQuat.default_params()
    pb = disperse_initial_state(RocketQuat, params, jax.random.PRNGKey(0),
                                batch, scale=2.0)

    @jax.jit
    def run(pbatch):
        return jax.vmap(lambda p: solve_scvx(RocketQuat, p, cfg))(pbatch)

    def fence(r):
        # force a device->host transfer: on remote-attached TPUs
        # block_until_ready returns before execution completes, so honest
        # timing requires a data dependency reaching the host
        return float(jnp.sum(r.td.X)) + float(jnp.sum(r.nonlinear_cost))

    # compile + warm up
    t0 = time.perf_counter()
    res = run(pb)
    fence(res)
    compile_s = time.perf_counter() - t0
    print(f"# compile+first-run: {compile_s:.1f}s, batch={batch}, "
          f"budget={budget}, device={jax.devices()[0].platform}",
          file=sys.stderr)

    times = []
    for i in range(repeats):
        pb_i = jax.tree_util.tree_map(lambda a: a, pb)
        t0 = time.perf_counter()
        res = run(pb_i)
        fence(res)
        times.append(time.perf_counter() - t0)
    best = min(times)
    solves_per_s = batch / best

    conv = int(jnp.sum(jnp.asarray(res.converged)))
    print(f"# best={best:.3f}s over {repeats} runs; "
          f"{conv}/{batch} converged; max_residual="
          f"{float(jnp.max(res.max_residual)):.2e}", file=sys.stderr)

    per_chip_target = 1000.0 / 16.0
    print(json.dumps({
        "metric": "rocketquat_k30_scvx_solves_per_s_per_chip",
        "value": round(solves_per_s, 3),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / per_chip_target, 4),
    }))


if __name__ == "__main__":
    main()
