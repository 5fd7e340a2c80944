"""On-chip shakedown of the monolithic IPM at flagship shapes.

Builds the real RocketQuat K=30 SCvx subproblem, batches it over B
dispersed scenarios, and times the unfused staged IPM vs the fused
kernel under the headline solver settings. Reports compile + steady
times and cross-checks the solutions.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from scpp_tpu.algos.staged_problems import build_scvx_subproblem_staged
from scpp_tpu.models import RocketQuat
from scpp_tpu.ops.discretization import multiple_shooting
from scpp_tpu.parallel.scenarios import disperse_initial_state
from scpp_tpu.solver.ipm import IPMSettings
from scpp_tpu.solver.ipm_mono import solve_staged_ipm_mono
from scpp_tpu.solver.ipm_staged import solve_staged_ipm

B = int(os.environ.get("MONO_B", "64"))
SET = IPMSettings(iters=int(os.environ.get("MONO_ITERS", "6")),
                  eps_reg=1e-4, eps_feas=1e-4, refine_steps=0)


def main():
    print(f"device={jax.devices()[0]} B={B} iters={SET.iters}")
    params = RocketQuat.default_params()
    pb = disperse_initial_state(RocketQuat, params, jax.random.PRNGKey(0),
                                B, scale=2.0)

    def build(p):
        p = RocketQuat.nondimensionalize(p)
        par = RocketQuat.param_vector(p)
        td = RocketQuat.init_trajectory(p, 30, True)
        ref = RocketQuat.constraint_ref(p, td)
        dd = multiple_shooting(RocketQuat, par, td, substeps=6,
                               variable_time=False)
        return build_scvx_subproblem_staged(
            RocketQuat, p, td, dd, jnp.asarray(5.0, td.X.dtype),
            jnp.asarray(1e3, td.X.dtype), ref, None)

    t0 = time.perf_counter()
    progs = jax.jit(jax.vmap(build))(pb)
    jax.block_until_ready(progs.A_eq)
    print(f"build: {time.perf_counter()-t0:.1f}s  shapes K={progs.K} "
          f"w={progs.w} me={progs.me} mc={progs.mc} l={progs.l} "
          f"socs={progs.soc_sizes}")

    results = {}
    import os as _os2
    only = _os2.environ.get("MONO_ONLY")
    pairs = [
        ("unfused", lambda ps: jax.vmap(
            lambda p: solve_staged_ipm(p, SET))(ps)),
        ("mono", lambda ps: jax.vmap(
            lambda p: solve_staged_ipm_mono(p, SET))(ps))]
    if only:
        pairs = [pr for pr in pairs if pr[0] == only]
    for name, fn in pairs:
        f = jax.jit(fn)

        def fence(r):
            # device->host transfer: on the remote-attach tunnel,
            # block_until_ready returns before execution completes
            return float(jnp.sum(r.x_stage)) + float(jnp.sum(r.obj))

        t0 = time.perf_counter()
        try:
            res = f(progs)
            fence(res)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: "
                  + str(e).splitlines()[0][:200])
            import traceback
            traceback.print_exc()
            continue
        t_compile = time.perf_counter() - t0
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            fence(f(progs))
            ts.append(time.perf_counter() - t0)
        t_run = min(ts)
        results[name] = res
        print(f"{name}: compile+first {t_compile:.1f}s  "
              f"steady {t_run*1e3:.2f} ms  ({t_run*1e3/B:.3f} ms/scenario)"
              f"  obj[0]={float(res.obj[0]):.6f}  "
              f"res_pri max={float(jnp.max(res.res_pri)):.3e}  "
              f"res_gap max={float(jnp.max(res.res_gap)):.3e}")

    if len(results) == 2:
        dx = np.abs(np.asarray(results["mono"].x_stage)
                    - np.asarray(results["unfused"].x_stage))
        xs = np.abs(np.asarray(results["unfused"].x_stage)).max()
        dobj = np.abs(np.asarray(results["mono"].obj)
                      - np.asarray(results["unfused"].obj))
        print(f"x max abs diff: {dx.max():.3e} (scale {xs:.1f}); "
              f"obj max diff: {dobj.max():.3e}")


if __name__ == "__main__":
    main()
