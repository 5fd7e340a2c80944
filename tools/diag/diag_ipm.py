"""Solve ONE flagship subproblem (the step-0 SCvx subproblem, trust=5)
with the staged IPM and SCPP_IPM_DEBUG per-iteration tracing.

Env: DIAG_PLATFORM, DIAG_X64, DIAG_KKT, DIAG_ITERS, DIAG_REFINE,
DIAG_DENSE=1 to also run the dense-backend oracle on the same subproblem.
"""
import os

import jax

if os.environ.get("DIAG_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["DIAG_PLATFORM"])
if os.environ.get("DIAG_X64") == "1":
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from scpp_tpu.algos.common import linear_defect_cost
from scpp_tpu.algos.staged_problems import build_scvx_subproblem_staged
from scpp_tpu.configs.algorithms import SCvxConfig
from scpp_tpu.models import RocketQuat
from scpp_tpu.ops.discretization import multiple_shooting
from scpp_tpu.parallel.scenarios import disperse_initial_state
from scpp_tpu.solver.ipm import IPMSettings
from scpp_tpu.solver.ipm_staged import solve_staged_ipm


def main():
    scen = int(os.environ.get("DIAG_SCEN", "0"))
    cfg = SCvxConfig(K=30, nondimensionalize=True, substeps=6,
                     state_trust_region=5.0)
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
    dd = multiple_shooting(RocketQuat, par, td, substeps=6,
                           variable_time=False)
    trust = jnp.asarray(5.0, dtype)
    prog = build_scvx_subproblem_staged(RocketQuat, p, td, dd, trust, w_nu,
                                        ref, jnp.asarray(5.0, dtype))
    print(f"K={prog.K} w={prog.w} g={prog.g} me={prog.me} l={prog.l} "
          f"soc={prog.soc_sizes} l_g={prog.l_g} soc_g={prog.soc_sizes_g} "
          f"meg={prog.A_geq.shape[0]} mcg={prog.G_g.shape[0]}")
    s = IPMSettings(
        iters=int(os.environ.get("DIAG_ITERS", "25")),
        eps_reg=float(os.environ.get("DIAG_EPSREG", "1e-4")),
        eps_feas=1e-4,
        refine_steps=int(os.environ.get("DIAG_REFINE", "2")),
        kkt=os.environ.get("DIAG_KKT", "cr"))
    res = solve_staged_ipm(prog, s)
    jax.block_until_ready(res.obj)
    new_td = td.replace(X=prog.extract(res.x, "X"),
                        U=prog.extract(res.x, "U"))
    L = float(linear_defect_cost(new_td, dd))
    print(f"staged: obj={float(res.obj):.6e} L={L:.6e} "
          f"rp={float(res.res_pri):.3e} rd={float(res.res_dua):.3e} "
          f"rg={float(res.res_gap):.3e}")

    if os.environ.get("DIAG_DENSE") == "1":
        from scpp_tpu.algos.scvx import build_scvx_subproblem
        from scpp_tpu.solver import solve as solve_dense
        progd = build_scvx_subproblem(RocketQuat, p, td, dd, trust, w_nu,
                                      ref, True, jnp.asarray(5.0, dtype))
        resd = solve_dense(progd, s)
        ntd = td.replace(X=progd.extract(resd.x, "X"),
                         U=progd.extract(resd.x, "U"))
        Ld = float(linear_defect_cost(ntd, dd))
        print(f"dense:  obj={float(resd.obj):.6e} L={Ld:.6e} "
              f"rp={float(resd.res_pri):.3e} rd={float(resd.res_dua):.3e} "
              f"rg={float(resd.res_gap):.3e}")


if __name__ == "__main__":
    main()
