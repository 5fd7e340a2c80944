"""Diagnose flagship fp32 convergence: run the exact bench config at B=1..N
on TPU (or CPU-fp32 / CPU-f64 via env), printing per-step history.

Env: DIAG_SCEN (which scenario from the bench dispersion, default 0),
DIAG_BATCH (default 1), DIAG_PLATFORM (cpu|tpu, default whatever),
DIAG_X64 (1 -> enable x64).
"""
import os
import sys

import jax

# the hosting environment force-registers the TPU platform at interpreter
# boot and overwrites jax_platforms; the env var alone is not enough
if os.environ.get("DIAG_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["DIAG_PLATFORM"])

if os.environ.get("DIAG_X64") == "1":
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from scpp_tpu.algos.scvx import solve_scvx
from scpp_tpu.configs.algorithms import SCvxConfig
from scpp_tpu.models import RocketQuat
from scpp_tpu.parallel.scenarios import disperse_initial_state
from scpp_tpu.solver.ipm import IPMSettings


def main():
    scen = int(os.environ.get("DIAG_SCEN", "0"))
    batch = int(os.environ.get("DIAG_BATCH", "1"))
    budget = int(os.environ.get("DIAG_BUDGET", "45"))
    backend = os.environ.get("DIAG_BACKEND", "staged")
    kkt = os.environ.get("DIAG_KKT", "cr")

    cfg = SCvxConfig(
        K=30, max_iterations=30, solve_budget=budget,
        change_threshold=1e-3, nondimensionalize=True,
        substeps=6, sim_substeps=8, state_trust_region=5.0,
        backend=backend,
        solver=IPMSettings(iters=25, eps_reg=1e-4, eps_feas=1e-4,
                           refine_steps=2, kkt=kkt),
    )
    params = RocketQuat.default_params()
    pb = disperse_initial_state(RocketQuat, params, jax.random.PRNGKey(0),
                                16, scale=2.0)
    # slice scenarios [scen, scen+batch)
    psel = jax.tree_util.tree_map(lambda a: a[scen:scen + batch], pb)

    run = jax.jit(jax.vmap(lambda p: solve_scvx(RocketQuat, p, cfg)))
    res = run(psel)
    jax.block_until_ready(res.td.X)

    dev = jax.devices()[0].platform
    x64 = jax.config.jax_enable_x64
    print(f"platform={dev} x64={x64} backend={backend} kkt={kkt} "
          f"scen={scen} batch={batch}")
    for b in range(batch):
        conv = bool(res.converged[b])
        iters = int(res.iterations[b])
        mres = float(res.max_residual[b])
        print(f"[{scen+b:2d}] converged={conv} iters={iters} "
              f"max_res={mres:.3e}")
        J = res.nonlinear_cost[b]
        L = res.linear_cost[b]
        acc = res.accepted[b]
        for i in range(budget):
            j, l, a = float(J[i]), float(L[i]), bool(acc[i])
            if j == 0.0 and l == 0.0 and not a and i > 0:
                break
            print(f"    step {i:2d} J={j:12.5e} L={l:12.5e} acc={int(a)}")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
