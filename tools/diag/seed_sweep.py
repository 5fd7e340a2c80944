"""Headline-config robustness across dispersion seeds (VERDICT r04 #5).

The r04 frontier showed iters=6/refine=0 in-basin on 2 seeds while
iters=7-8 landed outside on some — two seeds is thin evidence for a
chaotic frontier. This sweeps >= 10 seeds at the headline config and
records the J_end distribution + convergence; the headline config is
"robust" iff every seed's batch converges 64/64 with final_cost_max in
the basin (< 0.06).

Run on the chip: python - < tools/diag/seed_sweep.py
Env: SWEEP_SEEDS (default 10), BENCH_BATCH (default 64), BENCH_MONO.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

from bench import _flagship_config  # noqa: E402


def main():
    n_seeds = int(os.environ.get("SWEEP_SEEDS", "10"))
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    from scpp_tpu.algos.scvx import solve_scvx
    from scpp_tpu.models import RocketQuat
    from scpp_tpu.parallel.scenarios import disperse_initial_state

    cfg = _flagship_config(45)
    params = RocketQuat.default_params()

    @jax.jit
    def run(pbatch):
        return jax.vmap(lambda p: solve_scvx(RocketQuat, p, cfg))(pbatch)

    rows = []
    compiled = None
    for seed in range(n_seeds):
        pb = disperse_initial_state(RocketQuat, params,
                                    jax.random.PRNGKey(seed), batch,
                                    scale=2.0)
        if compiled is None:
            compiled = run.lower(pb).compile()
        t0 = time.perf_counter()
        res = compiled(pb)
        float(jnp.sum(res.td.X))
        dt = time.perf_counter() - t0
        J = np.asarray(res.nonlinear_cost)[:, -1]
        conv = int(np.asarray(res.converged).sum())
        row = {"seed": seed, "converged": conv,
               "J_end_max": round(float(J.max()), 6),
               "J_end_mean": round(float(J.mean()), 6),
               "in_basin": bool(J.max() < 0.06),
               "solve_s": round(dt, 3),
               "solves_per_s": round(conv / dt, 2)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    ok = all(r["in_basin"] and r["converged"] == batch for r in rows)
    summary = {
        "metric": "headline_seed_sweep",
        "seeds": n_seeds, "batch": batch,
        "all_converged_in_basin": ok,
        "J_end_max_worst": max(r["J_end_max"] for r in rows),
        "solves_per_s_min": min(r["solves_per_s"] for r in rows),
        "solves_per_s_max": max(r["solves_per_s"] for r in rows),
        "config": "iters=6 refine=0 eps=1e-4 monolith="
                  + os.environ.get("BENCH_MONO", "1"),
    }
    print(json.dumps(summary))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "seed_sweep_r05.json"), "w") as f:
        json.dump({"rows": rows, "summary": summary}, f, indent=1)


if __name__ == "__main__":
    main()
