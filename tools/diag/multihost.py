"""Multi-host (DCN) emulation: 2-process `jax.distributed` scenario sharding.

BASELINE.json's efficiency row asks for solves/s/chip at 1 chip / 1 host /
>= 2 hosts. Real multi-host hardware is not available here, so this script
demonstrates the multi-host path the way SURVEY §4 prescribes: two OS
processes, each owning 4 virtual CPU devices, joined into one 8-device
global mesh via ``jax.distributed.initialize``; the scenario batch is
sharded over the *global* mesh exactly as it would be over a v5e pod slice
(scenario parallelism crosses DCN only at dispatch — no inner-loop
collective leaves a host, SURVEY §2 "DCN only for multi-host scenario
sharding").

Correctness contract: per-scenario results of the 2-process run must match
a single-process run over the same 8-device mesh bit-for-bit (identical
per-device shard shapes -> identical XLA programs; scenarios share no
math). The parent orchestrates:

  1. single-process reference: one process, 8 virtual devices, sharded
     solve of the batch (same jit, same mesh shape);
  2. two worker processes (MH_ROLE=0/1), 4 virtual devices each,
     ``jax.distributed.initialize`` on a localhost coordinator; each saves
     its addressable output shards + global scenario indices;
  3. reassembly + comparison; writes MULTIHOST.json at the repo root.

Run: python tools/diag/multihost.py          (parent; spawns workers)
Env: MH_BATCH (default 16), MH_PORT (default 12355).
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
N_PROC = 2
DEV_PER_PROC = 4


def _setup_jax(n_local_devices):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_local_devices}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    return jax


def _solve_cfg():
    from scpp_tpu.configs.algorithms import SCConfig
    from scpp_tpu.solver.ipm import IPMSettings
    # stock Rocket2D SC (K=25, free final time): converges in ~6
    # iterations for scale-1 dispersions, so the artifact demonstrates
    # *converged* sharded solves; the sharding semantics are identical to
    # the flagship SCvx batch (pure scenario axis)
    return SCConfig(solver=IPMSettings(iters=25, eps_reg=1e-4,
                                       eps_feas=1e-4, refine_steps=2))


def _solve_sharded(jax, batch):
    """Build the sharded flagship-small solve over the GLOBAL mesh; returns
    (U array or shards, converged, mesh, elapsed_s)."""
    import jax.numpy as jnp  # noqa: F401
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from scpp_tpu.algos.sc import solve_sc
    from scpp_tpu.models import Rocket2D
    from scpp_tpu.parallel.scenarios import disperse_initial_state

    cfg = _solve_cfg()
    params = Rocket2D.default_params()
    # every process builds the identical full batch (deterministic PRNG)
    pb = disperse_initial_state(Rocket2D, params, jax.random.PRNGKey(0),
                                batch, scale=1.0)
    pb = jax.tree_util.tree_map(np.asarray, pb)

    mesh = jax.sharding.Mesh(np.asarray(jax.devices()), ("scenario",))
    sharding = NamedSharding(mesh, P("scenario"))

    def to_global(a):
        return jax.make_array_from_callback(
            a.shape, sharding, lambda idx: a[idx])

    pb_g = jax.tree_util.tree_map(to_global, pb)

    @jax.jit
    def run(p):
        return jax.vmap(lambda q: solve_sc(Rocket2D, q, cfg))(p)

    t0 = time.perf_counter()
    res = run(pb_g)
    jax.block_until_ready((res.td.U, res.converged))
    elapsed = time.perf_counter() - t0
    return res, mesh, elapsed


def worker(role: int):
    port = os.environ.get("MH_PORT", "12355")
    jax = _setup_jax(DEV_PER_PROC)
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=N_PROC, process_id=role)
    assert len(jax.devices()) == N_PROC * DEV_PER_PROC, \
        f"global devices {len(jax.devices())}"
    assert len(jax.local_devices()) == DEV_PER_PROC

    batch = int(os.environ.get("MH_BATCH", "16"))
    res, mesh, elapsed = _solve_sharded(jax, batch)

    import numpy as np
    # save this process's addressable shards with global scenario indices
    shards = []
    for s in res.td.U.addressable_shards:
        lo = s.index[0].start or 0
        shards.append((lo, np.asarray(s.data)))
    conv_shards = [(s.index[0].start or 0, np.asarray(s.data))
                   for s in res.converged.addressable_shards]
    np.savez(os.path.join(REPO, f"tools/diag/_mh_worker{role}.npz"),
             idx=np.asarray([i for i, _ in shards]),
             U=np.stack([u for _, u in shards]),
             cidx=np.asarray([i for i, _ in conv_shards]),
             conv=np.stack([c for _, c in conv_shards]),
             elapsed=elapsed)
    jax.distributed.shutdown()


def single_process_reference(batch):
    """Run in a subprocess so the parent's jax stays uninitialized."""
    code = f"""
import os, sys, time
sys.path.insert(0, {REPO!r})
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count={N_PROC * DEV_PER_PROC}")
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.join({REPO!r}, "tools", "diag"))
import multihost
import numpy as np
res, mesh, elapsed = multihost._solve_sharded(jax, {batch})
np.savez(os.path.join({REPO!r}, "tools/diag/_mh_single.npz"),
         U=np.asarray(res.td.U), conv=np.asarray(res.converged),
         elapsed=elapsed)
"""
    subprocess.run([sys.executable, "-c", code], check=True,
                   cwd=REPO, timeout=1200)


def main():
    role = os.environ.get("MH_ROLE")
    if role is not None:
        worker(int(role))
        return

    batch = int(os.environ.get("MH_BATCH", "16"))
    t0 = time.time()
    single_process_reference(batch)

    # spawn the two "hosts"
    procs = []
    for r in range(N_PROC):
        env = dict(os.environ, MH_ROLE=str(r), PYTHONPATH=REPO)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env, cwd=REPO))
    rcs = [p.wait(timeout=1200) for p in procs]
    assert all(rc == 0 for rc in rcs), f"worker exit codes {rcs}"

    import numpy as np
    single = np.load(os.path.join(REPO, "tools/diag/_mh_single.npz"))
    U_ref, conv_ref = single["U"], single["conv"]

    shard = batch // (N_PROC * DEV_PER_PROC)
    U_mh = np.zeros_like(U_ref)
    conv_mh = np.zeros_like(conv_ref)
    seen = np.zeros(batch, bool)
    worker_elapsed = []
    for r in range(N_PROC):
        w = np.load(os.path.join(REPO, f"tools/diag/_mh_worker{r}.npz"))
        for i, lo in enumerate(w["idx"]):
            U_mh[lo:lo + shard] = w["U"][i]
            seen[lo:lo + shard] = True
        for i, lo in enumerate(w["cidx"]):
            conv_mh[lo:lo + shard] = w["conv"][i]
        worker_elapsed.append(float(w["elapsed"]))
    assert seen.all(), "workers did not cover the full batch"

    max_dev = float(np.max(np.abs(U_mh - U_ref)))
    out = {
        "metric": "multihost_2proc_vs_singleproc_sharded",
        "batch": batch,
        "processes": N_PROC,
        "devices_per_process": DEV_PER_PROC,
        "max_control_deviation": max_dev,
        "bitwise_equal": bool(max_dev == 0.0),
        "converged_equal": bool((conv_mh == conv_ref).all()),
        "converged": int(conv_mh.sum()),
        "single_elapsed_s": round(float(single["elapsed"]), 3),
        "worker_elapsed_s": [round(e, 3) for e in worker_elapsed],
        "wall_s": round(time.time() - t0, 1),
        "note": ("2 OS processes x 4 virtual CPU devices, one global "
                 "8-device mesh via jax.distributed; identical per-device "
                 "shard shapes -> identical XLA programs, so per-scenario "
                 "bitwise equality is the expected outcome"),
    }
    with open(os.path.join(REPO, "MULTIHOST.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    ok = out["converged_equal"] and max_dev < 1e-6
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    sys.path.insert(0, REPO)
    main()
