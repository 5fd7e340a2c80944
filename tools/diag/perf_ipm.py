"""Profile the staged IPM + SCvx step on the real TPU at bench settings.

Measures, at B=64 flagship shapes:
  - one batched staged IPM solve vs (refine_steps, iters) settings
  - actual IPM iteration counts needed (scored via convergence at k)
  - full solve_scvx wall time vs IPM settings

Usage: python tools/diag/perf_ipm.py [quick|scvx]
"""

import sys
import time

import jax
import jax.numpy as jnp

from scpp_tpu.algos.staged_problems import build_scvx_subproblem_staged
from scpp_tpu.models import RocketQuat
from scpp_tpu.ops.discretization import multiple_shooting
from scpp_tpu.solver.ipm import IPMSettings
from scpp_tpu.solver.ipm_staged import solve_staged_ipm

B = 64


def make_batch():
    params = RocketQuat.default_params()
    p = RocketQuat.nondimensionalize(params)
    par = RocketQuat.param_vector(p)
    td = RocketQuat.init_trajectory(p, 30, True)
    ref = RocketQuat.constraint_ref(p, td)
    dtype = td.X.dtype
    tdb = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), td)
    disc = jax.jit(jax.vmap(lambda td_: multiple_shooting(
        RocketQuat, par, td_, substeps=6, variable_time=False)))
    dd_b = disc(tdb)
    return p, td, ref, tdb, dd_b, dtype


def timeit(f, *args, n=3):
    out = f(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "quick"
    p, td, ref, tdb, dd_b, dtype = make_batch()

    if mode == "quick":
        # program build alone
        def build_only(td_, dd_):
            return build_scvx_subproblem_staged(
                RocketQuat, p, td_, dd_, jnp.asarray(5.0, dtype),
                jnp.asarray(1e3, dtype), ref, None)

        t, _ = timeit(jax.jit(jax.vmap(build_only)), tdb, dd_b)
        print(f"build only: {t*1e3:7.1f} ms")

        for prec, kkt_prec, refine in [
                ("highest", "highest", 2),
                ("highest", "default", 2),
                ("highest", "default", 3),
                ("highest", "high", 2),
        ]:
            s = IPMSettings(iters=25, eps_reg=1e-4, eps_feas=1e-4,
                            refine_steps=refine, matmul_precision=prec,
                            kkt_precision=kkt_prec)

            def one(td_, dd_):
                prog = build_scvx_subproblem_staged(
                    RocketQuat, p, td_, dd_, jnp.asarray(5.0, dtype),
                    jnp.asarray(1e3, dtype), ref, None)
                return solve_staged_ipm(prog, s)

            f = jax.jit(jax.vmap(one))
            t, res = timeit(f, tdb, dd_b)
            print(f"prec={prec:<8} kkt={kkt_prec:<8} refine={refine}: "
                  f"{t*1e3:7.1f} ms  "
                  f"res_pri={float(jnp.max(res.res_pri)):.2e} "
                  f"res_dua={float(jnp.max(res.res_dua)):.2e} "
                  f"gap={float(jnp.max(res.res_gap)):.2e}")
    elif mode == "scvx":
        from scpp_tpu.algos.scvx import solve_scvx
        from scpp_tpu.parallel.scenarios import disperse_initial_state
        from scpp_tpu.configs.algorithms import SCvxConfig

        params = RocketQuat.default_params()
        pb = disperse_initial_state(RocketQuat, params,
                                    jax.random.PRNGKey(0), B, scale=2.0)
        for refine, iters, eps in [(2, 25, 1e-4), (1, 25, 1e-4),
                                   (1, 20, 1e-4), (0, 25, 1e-4)]:
            cfg = SCvxConfig(
                K=30, max_iterations=30, solve_budget=45,
                change_threshold=1e-3, nondimensionalize=True,
                substeps=6, sim_substeps=8,
                solver=IPMSettings(iters=iters, eps_reg=1e-4, eps_feas=eps,
                                   refine_steps=refine))

            @jax.jit
            def run(pbatch):
                return jax.vmap(lambda q: solve_scvx(RocketQuat, q, cfg))(
                    pbatch)

            t, res = timeit(run, pb, n=2)
            conv = int(jnp.sum(jnp.asarray(res.converged)))
            print(f"refine={refine} iters={iters} eps={eps:.0e}: "
                  f"{t:6.2f} s  {conv}/{B} conv  "
                  f"steps_max={int(jnp.max(res.steps))} "
                  f"solves/s={B / t:6.2f}")


if __name__ == "__main__":
    main()
