"""Unrolled flagship SCvx stepping: at each step, solve the subproblem with
several solver configurations and report obj / L / residuals side by side.

The carried trajectory follows the PRIMARY config; alternates are probes.

Env: DIAG_PLATFORM, DIAG_X64, DIAG_SCEN, DIAG_STEPS.
"""
import os

import jax

if os.environ.get("DIAG_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["DIAG_PLATFORM"])
if os.environ.get("DIAG_X64") == "1":
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from scpp_tpu.algos.common import linear_defect_cost, nonlinear_defect_cost
from scpp_tpu.algos.scvx import build_scvx_subproblem
from scpp_tpu.algos.staged_problems import build_scvx_subproblem_staged
from scpp_tpu.configs.algorithms import SCvxConfig
from scpp_tpu.models import RocketQuat
from scpp_tpu.ops.discretization import multiple_shooting
from scpp_tpu.parallel.scenarios import disperse_initial_state
from scpp_tpu.solver import solve as solve_dense
from scpp_tpu.solver.ipm import IPMSettings
from scpp_tpu.solver.ipm_staged import solve_staged_ipm


def main():
    scen = int(os.environ.get("DIAG_SCEN", "0"))
    steps = int(os.environ.get("DIAG_STEPS", "12"))

    cfg = SCvxConfig(
        K=30, max_iterations=30, solve_budget=45,
        change_threshold=1e-3, nondimensionalize=True,
        substeps=6, sim_substeps=8, state_trust_region=5.0,
    )
    params0 = RocketQuat.default_params()
    pball = disperse_initial_state(RocketQuat, params0,
                                   jax.random.PRNGKey(0), 16, scale=2.0)
    params = jax.tree_util.tree_map(lambda a: a[scen], pball)

    p = RocketQuat.nondimensionalize(params)
    par = RocketQuat.param_vector(p)
    td = RocketQuat.init_trajectory(p, cfg.K, cfg.interpolate_input)
    ref = RocketQuat.constraint_ref(p, td)
    dtype = td.X.dtype
    w_nu = jnp.asarray(cfg.weight_virtual_control, dtype)

    probes = {
        "staged_cr_r2": IPMSettings(iters=25, eps_reg=1e-4, eps_feas=1e-4,
                                    refine_steps=2, kkt="cr"),
        "staged_seq_r2": IPMSettings(iters=25, eps_reg=1e-4, eps_feas=1e-4,
                                     refine_steps=2, kkt="seq"),
        "staged_cr_r4": IPMSettings(iters=40, eps_reg=1e-4, eps_feas=1e-4,
                                    refine_steps=4, kkt="cr"),
    }
    if os.environ.get("DIAG_DENSE") == "1":
        probes["dense"] = IPMSettings(iters=40, eps_reg=1e-4,
                                      eps_feas=1e-4, refine_steps=2)

    @jax.jit
    def disc(td_):
        return multiple_shooting(RocketQuat, par, td_, substeps=cfg.substeps,
                                 variable_time=False)

    def solve_probe(name, s, td_, dd, trust):
        x_tr = jnp.asarray(trust * (cfg.state_trust_region
                                    / cfg.trust_region), dtype)
        if name == "dense":
            prog = build_scvx_subproblem(RocketQuat, p, td_, dd,
                                         jnp.asarray(trust, dtype), w_nu,
                                         ref, True, x_tr)
            res = solve_dense(prog, s)
            new_td = td_.replace(X=prog.extract(res.x, "X"),
                                 U=prog.extract(res.x, "U"))
        else:
            prog = build_scvx_subproblem_staged(
                RocketQuat, p, td_, dd, jnp.asarray(trust, dtype), w_nu,
                ref, x_tr)
            res = solve_staged_ipm(prog, s)
            new_td = td_.replace(X=prog.extract(res.x, "X"),
                                 U=prog.extract(res.x, "U"))
        L = float(linear_defect_cost(new_td, dd))
        J = float(nonlinear_defect_cost(RocketQuat, par, new_td,
                                        cfg.sim_substeps, cfg.integrator))
        return new_td, L, J, float(res.obj), float(res.res_pri), \
            float(res.res_dua), float(res.res_gap)

    trust = float(cfg.trust_region)
    last_J = None
    print(f"platform={jax.devices()[0].platform} x64={jax.config.jax_enable_x64}"
          f" scen={scen}")
    for it in range(steps):
        dd = disc(td)
        outs = {}
        for name, s in probes.items():
            outs[name] = solve_probe(name, s, td, dd, trust)
        print(f"step {it:2d} trust={trust:9.3e} last_J="
              f"{last_J if last_J is None else f'{last_J:.5e}'}")
        for name, (ntd, L, J, obj, rp, rd, rg) in outs.items():
            print(f"    {name:<14} L={L:12.5e} J={J:12.5e} obj={obj:12.5e}"
                  f" rp={rp:9.2e} rd={rd:9.2e} rg={rg:9.2e}")
        # follow the primary config with the real acceptance logic
        new_td, L, J_new, *_ = outs["staged_cr_r2"]
        if last_J is None:
            accept, grow, shrink = True, False, False
        else:
            actual = last_J - J_new
            predicted = last_J - L
            rho = actual / predicted if abs(predicted) > 1e-30 else 0.0
            accept = rho >= cfg.rho_0 and predicted == predicted
            shrink = (not accept) or rho < cfg.rho_1
            grow = accept and rho >= cfg.rho_2
            print(f"    -> rho={rho:.4f} accept={accept}")
        if accept:
            td = new_td
        last_J = J_new
        if shrink:
            trust /= cfg.alpha
        elif grow:
            trust *= cfg.beta


if __name__ == "__main__":
    main()
