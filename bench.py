"""Headline benchmark: batched RocketQuat K=30 SCvx solves/s on one chip.

Prints ONE JSON line (the last stdout line): {"metric", "value", "unit",
"vs_baseline", ...}.

The north-star target (BASELINE.json) is >= 1000 concurrent RocketQuat
K=30 SCvx solves/s on a v5e-16, i.e. 62.5 solves/s/chip — ``vs_baseline``
is measured throughput relative to that per-chip target, counting only
*converged* solves. Each "solve" is a full stock-budget SCvx run (30
accepted iterations / 45 subproblem budget, SCvx.info parity) over
dispersed initial states, run entirely on-device in float32 with the
staged block-tridiagonal IPM backend (SCvxConfig.backend="staged").

Crash containment: the headline JSON is assembled right after the
throughput section; every optional extra (phase breakdown, MPC latency,
batch sweep) runs inside try/except and can only *add* fields. A failing
extra prints its traceback to stderr and the headline still emits.

Environment knobs: BENCH_BATCH (default 64), BENCH_BUDGET (default stock
45), BENCH_REPEATS (default 3), BENCH_PHASES=0 to skip the phase
breakdown, BENCH_SWEEP=1 to add a batch-size sweep.
"""

import hashlib
import json
import os
import platform
import sys
import time

import jax


def _machine_tag() -> str:
    # key the persistent cache by host CPU: AOT results from a different
    # machine SIGILL on load (see tests/conftest.py)
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        flags = ""
    return hashlib.sha256(
        (platform.machine() + flags).encode()).hexdigest()[:12]


# Where "compile+first-run" time actually goes (measured r04, decomposed
# with lower()/compile()/execute splits on the attached chip): local
# tracing ~13 s + local XLA compile ~23 s + FIRST EXECUTION of the fresh
# binary ~220-350 s. The first-exec cost is the remote-attach (axon
# tunnel) program-load path, not our program's XLA compile — an
# identical program re-executed by a later process loads in ~30 s, and a
# never-before-seen variant still compiles locally in ~23 s. On
# directly-attached TPUs the headline compile cost is therefore ~40 s.
# The persistent compilation cache is DEFAULT-ON (VERDICT r04 #7),
# keyed by machine so entries from a different host can't SIGILL on
# load (tests/conftest.py); JAX_CACHE_DIR overrides the location and
# JAX_CACHE_DIR="" disables it (for measuring cold compiles). It skips
# the ~36 s of local work; the remote program load is not cacheable
# from this side of the tunnel.
_cache_dir = os.environ.get("JAX_CACHE_DIR",
                            f"/tmp/jax_cache_{_machine_tag()}")
CACHE_WARM = bool(_cache_dir) and os.path.isdir(_cache_dir) and \
    bool(os.listdir(_cache_dir))
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402


def bench_phases(batch):
    """Per-phase device-time breakdown of one SCvx step (the reference
    prints per-phase ms every iteration, SCAlgorithm.cpp:69-92,117-128;
    this is the batched analog): discretize / build+conic-solve / resim,
    each jitted separately and timed warm on the bench batch."""
    from scpp_tpu.algos.common import nonlinear_defect_cost
    from scpp_tpu.algos.staged_problems import build_scvx_subproblem_staged
    from scpp_tpu.models import RocketQuat
    from scpp_tpu.ops.discretization import multiple_shooting
    from scpp_tpu.solver.ipm import IPMSettings
    from scpp_tpu.solver.ipm_staged import solve_staged_ipm

    params = RocketQuat.default_params()
    p = RocketQuat.nondimensionalize(params)
    par = RocketQuat.param_vector(p)
    td = RocketQuat.init_trajectory(p, 30, True)
    ref = RocketQuat.constraint_ref(p, td)
    dtype = td.X.dtype
    tdb = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape), td)
    # match the headline configuration (see _flagship_config)
    solver = IPMSettings(iters=int(os.environ.get("BENCH_IPM_ITERS", "10")),
                         eps_reg=1e-4, eps_feas=1e-4, refine_steps=0,
                         monolith=os.environ.get("BENCH_MONO", "1") != "0")

    def timed(name, f, *args):
        out = f(*args)
        jax.block_until_ready(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(*args)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        print(f"#   phase {name:<12} {min(ts)*1e3:8.1f} ms  (batch={batch})",
              file=sys.stderr)
        return out

    disc = jax.jit(jax.vmap(lambda td_: multiple_shooting(
        RocketQuat, par, td_, substeps=6, variable_time=False)))
    dd_b = timed("discretize", disc, tdb)

    def one(td_, dd_):
        # reference formulation (input-only trust region), matching the
        # headline configuration
        prog = build_scvx_subproblem_staged(
            RocketQuat, p, td_, dd_, jnp.asarray(5.0, dtype),
            jnp.asarray(1e3, dtype), ref, None)
        return solve_staged_ipm(prog, solver).x_stage
    timed("build+solve", jax.jit(jax.vmap(one)), tdb, dd_b)

    resim = jax.jit(jax.vmap(lambda td_: nonlinear_defect_cost(
        RocketQuat, par, td_, 8, "dopri5")))
    timed("resim", resim, tdb)


def bench_mpc_latency():
    """Second headline metric (BASELINE.json): MPC SOCP resolve latency,
    target p50 <= 10 ms on one chip.

    Reported both ways the target can be honestly evaluated on a
    REMOTE-ATTACHED chip (VERDICT r04 #3):

      - DEVICE-TIMED (the headline): a chain of 50 data-dependent
        resolves with distinct x_init values inside ONE jitted scan —
        no host round trip per solve, which is how a deployed
        controller-on-TPU runs (the reference's loop is likewise
        in-process, MPC_sim.cpp:45-90). p50/p99 are over repeated
        chain timings, each amortized per resolve.
      - HOST per-call p50/p99, raw and with the measured bare dispatch
        round trip (bench_dispatch) subtracted: the raw number is
        dominated by ~25 ms of tunnel latency.

    The first-order HSD backend is RETIRED from this matrix (r04
    measured 45/50 warm re-solves unsolved with accuracy degrading over
    iterations — solver/scs.py STATUS); it remains a test oracle.
    """
    import numpy as np

    from scpp_tpu.algos.mpc import mpc_solve
    from scpp_tpu.configs.algorithms import MPCConfig
    from scpp_tpu.models import Rocket2D

    p = Rocket2D.default_params()
    p = p.replace(x_init=jnp.asarray([5.0, 30.0, 1.0, -2.0, 0.05, 0.0]),
                  x_final=jnp.zeros(6), constrain_initial_final=False)
    x = jnp.asarray(p.x_init, jnp.float32)
    cfg = MPCConfig()

    # --- device-timed chain -------------------------------------------
    n_chain = 50
    xs = x[None, :] * (1.0 + 0.01 * jnp.arange(n_chain))[:, None]

    @jax.jit
    def chain(xs):
        def step(carry, x_i):
            # data dependency serializes the resolves
            _, U, res = mpc_solve(Rocket2D, p,
                                  x_i * (1.0 + 1e-12 * carry), cfg)
            r = jnp.maximum(res.res_pri, res.res_dua)
            return jnp.sum(U[0]), (U[0], r)
        _, (u0s, rs) = jax.lax.scan(step, jnp.asarray(0.0, x.dtype), xs)
        return u0s, rs

    u0s, rs = chain(xs)
    float(jnp.sum(u0s))  # compile + fence
    per_res = []
    for _ in range(10):
        t0 = time.perf_counter()
        u0s, rs = chain(xs)
        float(jnp.sum(u0s))
        per_res.append((time.perf_counter() - t0) * 1e3 / n_chain)
    per_res.sort()
    dev_p50 = per_res[len(per_res) // 2]
    dev_p99 = per_res[-1]
    max_res = float(jnp.max(rs))
    print(f"# mpc_resolve[device-chain]: p50={dev_p50:.2f} ms "
          f"p99={dev_p99:.2f} ms over 10x{n_chain} resolves, "
          f"max residual {max_res:.2e} (target p50 <= 10 ms)",
          file=sys.stderr)

    # --- host per-call ------------------------------------------------
    u = mpc_solve(Rocket2D, p, x, cfg)[1][0]
    float(jnp.sum(u))
    lats = []
    for i in range(50):
        x_i = x * (1.0 + 0.01 * i)
        t0 = time.perf_counter()
        u = mpc_solve(Rocket2D, p, x_i, cfg)[1][0]
        float(jnp.sum(u))
        lats.append((time.perf_counter() - t0) * 1e3)
    lats = np.sort(np.asarray(lats))
    host_p50 = float(lats[len(lats) // 2])
    host_p99 = float(lats[int(len(lats) * 0.99)])
    print(f"# mpc_resolve[host-call]: p50={host_p50:.2f} ms "
          f"p99={host_p99:.2f} ms (includes dispatch round trip)",
          file=sys.stderr)

    # --- closed loop on device (deployment shape) ---------------------
    device_ms = None
    try:
        from scpp_tpu.drivers.closed_loop import mpc_sim
        n_steps = 200
        hist = mpc_sim(Rocket2D, p, cfg, 2.0, 0.01)
        jax.block_until_ready(hist.X)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            hist = mpc_sim(Rocket2D, p, cfg, 2.0, 0.01)
            float(jnp.sum(hist.X))
            ts.append(time.perf_counter() - t0)
        device_ms = min(ts) * 1e3 / n_steps
        print(f"# mpc on-device loop: {device_ms:.3f} ms/step over "
              f"{n_steps} steps (solve+simulate, target <= 10 ms)",
              file=sys.stderr)
    except Exception:
        import traceback
        traceback.print_exc()
    return {"device_p50": dev_p50, "device_p99": dev_p99,
            "device_chain_max_residual": max_res,
            "host_p50": host_p50, "host_p99": host_p99,
            "loop_ms": device_ms}


def _flagship_config(budget):
    from scpp_tpu.configs.algorithms import SCvxConfig
    from scpp_tpu.solver.ipm import IPMSettings

    # stock RocketQuat SCvx.info parameters, reference-exact formulation
    # (input-only trust region, SCvxProblem.cpp:58-68). The IPM iteration
    # cap sits on the measured r04 quality-speed frontier: the solver is
    # op-dispatch bound (~8.6 ms per IPM iteration at these shapes
    # regardless of op sizes), so capping iterations is the dominant
    # lever — iters=6/refine=0 keeps 64/64 convergence with the final
    # resimulated defect cost inside the tight-oracle basin across seeds
    # (J_end max 0.038-0.048 vs basin bound 0.06; iters=7 and 8 land
    # OUTSIDE the basin on some seeds — the frontier is non-monotonic, so
    # the bench gates every run via final_cost_in_basin). The SCvx
    # accept test resimulates the real dynamics, which is what makes
    # low-accuracy subproblem solves safe: bad steps get rejected on the
    # true cost, not the conic model. Conservative settings
    # (iters=25, refine=2) remain the test_fp32.py-pinned fallback.
    # monolith=True routes the conic solve through the fused whole-solve
    # Pallas kernel (solver/ipm_mono.py): measured 102 ms vs 164 ms
    # unfused for the B=64 subproblem batch on v5e (BENCH_MONO=0
    # reverts to the unfused staged path for A/B runs)
    # IPM iteration cap: the r05 10-seed sweeps
    # (tools/diag/seed_sweep_r05.json) show the quality-speed frontier
    # is bimodal — iters=6 is fastest (31.6 solves/s) but lands outside
    # the defect basin on 2/10 dispersion seeds, while iters=7-9 are
    # far outside on many seeds; iters=10 is the fastest config that is
    # IN BASIN with 64/64 convergence on ALL 10 seeds (J_end max 0.049
    # vs bound 0.06), so per the r04 review protocol the headline takes
    # the robust config and the throughput hit honestly. The bench
    # still gates every run with final_cost_in_basin.
    monolith = os.environ.get("BENCH_MONO", "1") != "0"
    iters = int(os.environ.get("BENCH_IPM_ITERS", "10"))
    return SCvxConfig(
        K=30, max_iterations=30, solve_budget=budget,
        change_threshold=1e-3, nondimensionalize=True,
        substeps=6, sim_substeps=8,
        solver=IPMSettings(iters=iters, eps_reg=1e-4, eps_feas=1e-4,
                           refine_steps=0, monolith=monolith),
    )


def _fence(r):
    # force a device->host transfer: on remote-attached TPUs
    # block_until_ready returns before execution completes, so honest
    # timing requires a data dependency reaching the host
    return float(jnp.sum(r.td.X)) + float(jnp.sum(r.nonlinear_cost))


def bench_throughput(batch, budget, repeats):
    """Flagship throughput at one batch size; returns the metrics dict."""
    from scpp_tpu.algos.scvx import solve_scvx
    from scpp_tpu.models import RocketQuat
    from scpp_tpu.parallel.scenarios import disperse_initial_state

    cfg = _flagship_config(budget)
    params = RocketQuat.default_params()
    pb = disperse_initial_state(RocketQuat, params, jax.random.PRNGKey(0),
                                batch, scale=2.0)

    @jax.jit
    def run(pbatch):
        return jax.vmap(lambda p: solve_scvx(RocketQuat, p, cfg))(pbatch)

    # decomposed pipeline (see the cache note at the top): local trace,
    # local XLA compile, then first execution — which on a remote-attached
    # chip includes the one-time program load (~220-350 s through the
    # tunnel vs ~40 s of actual local compile)
    t0 = time.perf_counter()
    lowered = run.lower(pb)
    trace_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    xla_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = compiled(pb)
    _fence(res)
    first_run_s = time.perf_counter() - t0
    compile_s = trace_s + xla_s + first_run_s
    print(f"# compile+first-run: {compile_s:.1f}s (trace {trace_s:.1f} + "
          f"xla {xla_s:.1f} + first-exec/load {first_run_s:.1f}), "
          f"batch={batch}, budget={budget}, "
          f"device={jax.devices()[0].platform}", file=sys.stderr)

    times = []
    for _ in range(repeats):
        pb_i = jax.tree_util.tree_map(lambda a: a, pb)
        t0 = time.perf_counter()
        # reuse the explicitly-compiled executable: the jit wrapper's own
        # cache is separate from lowered.compile(), and calling run()
        # here would silently re-trace/re-load the program once
        res = compiled(pb_i)
        _fence(res)
        times.append(time.perf_counter() - t0)
    best = min(times)

    import numpy as np

    conv = int(jnp.sum(jnp.asarray(res.converged)))
    finite_res = jnp.where(jnp.isfinite(res.max_residual),
                           res.max_residual, 0.0)

    # conic residual at each scenario's LAST ACCEPTED step, reported
    # alongside max_residual (VERDICT r03 #4a). NOTE, measured: this is
    # ~0.2 at ANY solver accuracy (iters=12..25, refine=0..2 all give
    # 0.20-0.25) because the final accepted step of a converged run
    # happens at trust radius ~3e-4 where the subproblem is inherently
    # ill-conditioned. It is therefore NOT the answer-quality gate — the
    # SCvx guards accept on the RESIMULATED nonlinear cost, so the gate
    # below is final_cost_max sitting inside the tight-oracle defect
    # basin (0.02-0.06, tests/test_goldens.py).
    rp = np.asarray(res.res_pri)
    rd = np.asarray(res.res_dua)
    acc = np.asarray(res.accepted)
    step_res = np.maximum(rp, rd)
    has_acc = acc.any(axis=1)
    last_idx = acc.shape[1] - 1 - acc[:, ::-1].argmax(axis=1)
    fin = step_res[np.arange(acc.shape[0]), last_idx]
    residual_final = float(np.max(fin[has_acc])) if has_acc.any() else None

    # answer quality: final resimulated defect cost per scenario
    J_end = np.asarray(res.nonlinear_cost)[:, -1]
    final_cost_max = float(np.max(J_end))
    final_cost_mean = float(np.mean(J_end))

    # how often the solve budget binds (VERDICT r03 #9): scenarios that
    # used the full budget without converging and without reaching the
    # accept cap — the reference bounds accepts with unbounded rejects,
    # we bound total solves (PARITY.md)
    steps = np.asarray(res.steps)
    iters = np.asarray(res.iterations)
    convd = np.asarray(res.converged)
    budget_bound = int(np.sum((steps >= budget) & ~convd
                              & (iters < cfg.max_iterations)))

    print(f"# batch={batch}: best={best:.3f}s over {repeats} runs; "
          f"{conv}/{batch} converged; max_residual="
          f"{float(jnp.max(finite_res)):.2e}; residual_final="
          f"{residual_final if residual_final is None else round(residual_final, 6)}; "
          f"J_end max={final_cost_max:.4f} mean={final_cost_mean:.4f}; "
          f"budget_bound={budget_bound}", file=sys.stderr)
    return {
        "batch": batch,
        "seconds": round(best, 3),
        "solves_per_s": round(batch / best, 3),
        "converged_solves_per_s": round(conv / best, 3),
        "converged": conv,
        "compile_s": round(compile_s, 1),
        "compile_trace_s": round(trace_s, 1),
        "compile_xla_s": round(xla_s, 1),
        "first_exec_load_s": round(first_run_s, 1),
        "max_residual": float(jnp.max(finite_res)),
        "residual_final": residual_final,
        "final_cost_max": final_cost_max,
        "final_cost_mean": final_cost_mean,
        "final_cost_in_basin": bool(final_cost_max < 0.06),
        "budget_bound_scenarios": budget_bound,
    }


def bench_dispatch():
    """Bare host<->device dispatch round trip (a trivial jitted op +
    device->host transfer), backing the tunnel-latency attribution of the
    MPC per-call numbers (VERDICT r03 #4b)."""
    f = jax.jit(lambda a: a + 1.0)
    x = jnp.zeros(())
    float(f(x))
    lats = []
    for _ in range(30):
        t0 = time.perf_counter()
        float(f(x))
        lats.append((time.perf_counter() - t0) * 1e3)
    lats.sort()
    p50 = lats[len(lats) // 2]
    print(f"# dispatch round-trip p50: {p50:.3f} ms", file=sys.stderr)
    return p50


def main():
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    budget = int(os.environ.get("BENCH_BUDGET", "45"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))

    r = bench_throughput(batch, budget, repeats)
    per_chip_target = 1000.0 / 16.0
    headline = {
        "metric": "rocketquat_k30_scvx_converged_solves_per_s_per_chip",
        "value": r["converged_solves_per_s"],
        "unit": "solves/s",
        "vs_baseline": round(r["converged_solves_per_s"] / per_chip_target,
                             4),
        "raw_solves_per_s": r["solves_per_s"],
        "converged": r["converged"],
        "batch": batch,
        "compile_s": r["compile_s"],
        "compile_local_s": round(r["compile_trace_s"]
                                 + r["compile_xla_s"], 1),
        "first_exec_load_s": r["first_exec_load_s"],
        "compile_cache_warm": CACHE_WARM,
        "max_residual": round(r["max_residual"], 8),
        "residual_final": (None if r["residual_final"] is None
                           else round(r["residual_final"], 8)),
        "final_cost_max": round(r["final_cost_max"], 6),
        "final_cost_mean": round(r["final_cost_mean"], 6),
        "final_cost_in_basin": r["final_cost_in_basin"],
        "budget_bound_scenarios": r["budget_bound_scenarios"],
    }
    # evidence even if an extra below hard-crashes the process: mirror the
    # headline to stderr immediately
    print("# headline (pre-extras): " + json.dumps(headline),
          file=sys.stderr)

    def guarded(name, fn):
        try:
            return fn()
        except Exception:
            import traceback
            print(f"# extra '{name}' FAILED:", file=sys.stderr)
            traceback.print_exc()
            return None

    d = guarded("dispatch", bench_dispatch)
    if d is not None:
        headline["dispatch_ms"] = round(d, 3)

    if os.environ.get("BENCH_SWEEP", "0") == "1":
        sweep = guarded("sweep", lambda: [
            bench_throughput(b, budget, max(1, repeats - 1))
            for b in (16, 64, 256) if b != batch])
        if sweep:
            headline["sweep"] = [
                {k: s[k] for k in ("batch", "solves_per_s",
                                   "converged_solves_per_s", "converged")}
                for s in sweep]

    if os.environ.get("BENCH_PHASES", "1") != "0":
        guarded("phases", lambda: bench_phases(batch))

    mpc = guarded("mpc_latency", bench_mpc_latency)
    if mpc is not None:
        # second north-star metric (BASELINE.json): MPC resolve latency,
        # target p50 <= 10 ms. The recorded p50/p99 are DEVICE-TIMED
        # (chained in-process resolves, the deployment shape and the
        # reference's own loop shape, MPC_sim.cpp:45-90); host per-call
        # numbers (dominated by ~25 ms tunnel dispatch on a
        # remote-attached chip) are recorded alongside, with the bare
        # dispatch round trip measured separately as dispatch_ms.
        headline["mpc_resolve_p50_ms"] = round(mpc["device_p50"], 3)
        headline["mpc_resolve_p99_ms"] = round(mpc["device_p99"], 3)
        headline["mpc_resolve_max_residual"] = round(
            mpc["device_chain_max_residual"], 8)
        headline["mpc_resolve_host_p50_ms"] = round(mpc["host_p50"], 2)
        headline["mpc_resolve_host_p99_ms"] = round(mpc["host_p99"], 2)
        if mpc["loop_ms"] is not None:
            headline["mpc_device_step_ms"] = round(mpc["loop_ms"], 3)

    print(json.dumps(headline))


if __name__ == "__main__":
    main()
