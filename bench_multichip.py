"""Sharded-throughput check on a virtual 8-device CPU mesh.

BASELINE.json asks for solves/s/chip at 1 chip / 1 host / >= 2 hosts.
Multi-chip hardware is not available in this environment, so this script
measures what CAN be measured without it:

  1. the full flagship batch (RocketQuat K=30 SCvx, fp32, stock budget)
     solved unsharded (vmap on one device) vs sharded (shard_map over an
     8-device mesh on the same physical cores);
  2. the sharding overhead: since per-scenario solves are embarrassingly
     parallel (no cross-scenario math, SURVEY §2), the sharded program is
     the same per-device computation plus dispatch/layout cost — on real
     chips scaling is linear up to that overhead, which this quantifies;
  3. per-scenario numerical equality sharded-vs-unsharded (the
     distributed-correctness contract from SURVEY §4).

Virtual devices share host cores, so *throughput* here is not a chip
throughput — the overhead percentage and the equality check are the
meaningful outputs. Prints one JSON line.

Run: python bench_multichip.py   (forces CPU + 8 virtual devices itself)
Env: MC_BATCH (default 16), MC_DEVICES (default 8), MC_SMALL=1 for a
Rocket2D smoke configuration.
"""

import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count="
    + os.environ.get("MC_DEVICES", "8"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# x64 for the accuracy-lane section (f64 KKT factor); the fast-lane
# sections keep explicit fp32 data so their dtype regime is unchanged
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    batch = int(os.environ.get("MC_BATCH", "16"))
    n_dev = int(os.environ.get("MC_DEVICES", "8"))
    small = os.environ.get("MC_SMALL", "0") == "1"

    from scpp_tpu.configs.algorithms import SCvxConfig
    from scpp_tpu.models import Rocket2D, RocketQuat
    from scpp_tpu.parallel.scenarios import (
        disperse_initial_state, make_scenario_mesh, solve_batch)
    from scpp_tpu.solver.ipm import IPMSettings

    if small:
        model = Rocket2D
        cfg = SCvxConfig(K=10, max_iterations=8, solve_budget=12,
                         substeps=4, sim_substeps=5,
                         solver=IPMSettings(iters=20, eps_reg=1e-4,
                                            eps_feas=1e-4, refine_steps=2))
    else:
        model = RocketQuat
        # the bench.py flagship configuration (r04 frontier-tuned IPM cap)
        cfg = SCvxConfig(
            K=30, max_iterations=30, solve_budget=45, change_threshold=1e-3,
            nondimensionalize=True, substeps=6, sim_substeps=8,
            solver=IPMSettings(iters=6, eps_reg=1e-4, eps_feas=1e-4,
                               refine_steps=0))

    params = model.default_params()
    pb = disperse_initial_state(model, params, jax.random.PRNGKey(0),
                                batch, scale=2.0)

    devices = jax.devices()
    assert len(devices) >= n_dev, f"{len(devices)} devices < {n_dev}"

    def timed(fn):
        t0 = time.perf_counter()
        r = fn()
        jax.block_until_ready(r)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = fn()
        jax.block_until_ready(r)
        return r, time.perf_counter() - t0, compile_s

    r_un, t_un, c_un = timed(lambda: solve_batch(model, pb, cfg))
    mesh = make_scenario_mesh(devices[:n_dev])
    r_sh, t_sh, c_sh = timed(lambda: solve_batch(model, pb, cfg, mesh=mesh))

    # per-scenario equality (scenario solves share no math; sharding must
    # not change results). Final trajectories can diverge macroscopically
    # from ulp-level fp32 differences (XLA emits different fusions for the
    # B and B/n_dev batch sizes; SCvx accept/reject cascades amplify
    # them), so ALSO compare the step-0 subproblem solution — a genuine
    # sharding bug shows up there, amplification does not — and the final
    # defect-cost basin.
    du = np.asarray(r_un.td.U)
    ds = np.asarray(r_sh.td.U)
    max_dev = float(np.max(np.abs(du - ds)))
    step0_dev = float(np.max(np.abs(np.asarray(r_un.all_U[:, 0])
                                    - np.asarray(r_sh.all_U[:, 0]))))
    u_scale = float(np.max(np.abs(du)))
    J_u = np.asarray(r_un.nonlinear_cost)[:, -1]
    J_s = np.asarray(r_sh.nonlinear_cost)[:, -1]
    J_dev = float(np.max(np.abs(J_u - J_s)))

    # --- accuracy-lane equality (VERDICT r04 #8) ----------------------
    # f64-KKT lane: every subproblem solved to ~1e-6, so sharded and
    # unsharded iterates cannot hide behind fp32 chaos — assert direct
    # control-trajectory equality.
    lane_batch = int(os.environ.get("MC_LANE_BATCH", "6"))
    import dataclasses
    lane_cfg = dataclasses.replace(cfg, solver=IPMSettings(
        iters=30, eps_reg=1e-8, eps_feas=1e-6, refine_steps=1,
        refine_f64=True, kkt_dtype="float64"))
    pb_lane = jax.tree_util.tree_map(lambda a: a[:lane_batch], pb)
    rl_un, tl_un, cl_un = timed(
        lambda: solve_batch(model, pb_lane, lane_cfg))
    rl_sh, tl_sh, cl_sh = timed(
        lambda: solve_batch(model, pb_lane, lane_cfg,
                            mesh=make_scenario_mesh(
                                devices[:min(n_dev, lane_batch)])))
    lu, ls = np.asarray(rl_un.td.U), np.asarray(rl_sh.td.U)
    lane_dev_rel = float(np.max(np.abs(lu - ls))
                         / max(float(np.max(np.abs(lu))), 1e-30))
    lane_J_dev = float(np.max(np.abs(
        np.asarray(rl_un.nonlinear_cost)[:, -1]
        - np.asarray(rl_sh.nonlinear_cost)[:, -1])))

    out = {
        "metric": "sharded_vs_unsharded_flagship_batch",
        "batch": batch,
        "devices": n_dev,
        "unsharded_s": round(t_un, 3),
        "sharded_s": round(t_sh, 3),
        "overhead_pct": round(100.0 * (t_sh - t_un) / t_un, 2),
        "compile_unsharded_s": round(c_un, 1),
        "compile_sharded_s": round(c_sh, 1),
        "converged_unsharded": int(np.asarray(r_un.converged).sum()),
        "converged_sharded": int(np.asarray(r_sh.converged).sum()),
        "max_control_deviation": max_dev,
        "max_control_deviation_rel": max_dev / max(u_scale, 1e-30),
        "step0_control_deviation_rel": step0_dev / max(u_scale, 1e-30),
        "final_cost_deviation": J_dev,
        "accuracy_lane": {
            "batch": lane_batch,
            "control_deviation_rel": lane_dev_rel,
            "final_cost_deviation": lane_J_dev,
            "converged_unsharded": int(
                np.asarray(rl_un.converged).sum()),
            "converged_sharded": int(np.asarray(rl_sh.converged).sum()),
        },
        "note": ("virtual CPU devices share host cores; scenarios are "
                 "independent so real-chip scaling is linear minus this "
                 "overhead"),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
