"""Stock-config stall characterization (VERDICT r04 #9).

Two stock cases do not converge (PARITY.md): rocketquat_sc (SC.info
w_tr=50 stalls at ||nu||_1 ~ 2e-2) and rocket2d_scvx. The r04 question:
is the stall a true fixed point of the penalized iteration, or a
solver-accuracy artifact? The goldens already run the TIGHT f64 oracle
(eps_feas=1e-8) and still stall, so this study pins down the mechanism:

  1. FIXED-POINT TEST (rocketquat_sc): take the stalled trajectory,
     re-solve one subproblem at it with the tight oracle, and measure
     the step ||X_new - X_stall|| and the subproblem's optimal virtual
     control. A true fixed point returns (approximately) itself with
     nonzero nu — the penalized optimum at w_tr=50 genuinely retains
     virtual control, i.e. the stall is formulation-inherent at the
     stock weight, not numerical.
  2. WEIGHT SWEEP: the same solve with w_tr in {50, 200, 800}: if
     higher trust weights converge, the stock weight simply sits below
     the nu-suppression threshold for this model (the reference's
     w_nu=1e5 dominates only once iterates are near-feasible; its
     adaptive doubling of w_tr never triggers because ||nu|| > nu_tol).
  3. rocket2d_scvx at 3x stock budget with the tight oracle: does it
     converge eventually, or cycle?

Writes tools/diag/stall_study_r05.json. CPU/f64; slow (~tens of min).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import dataclasses  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from scpp_tpu.algos.sc import solve_sc  # noqa: E402
from scpp_tpu.algos.scvx import solve_scvx  # noqa: E402
from scpp_tpu.configs.algorithms import SCConfig, SCvxConfig  # noqa: E402
from scpp_tpu.models import Rocket2D, RocketQuat  # noqa: E402
from scpp_tpu.solver.ipm import IPMSettings  # noqa: E402

TIGHT = IPMSettings(iters=40, eps_feas=1e-8)
out = {}

# ---- 1+2: rocketquat_sc fixed point & weight sweep ----------------------
for w_tr in (50.0, 200.0, 800.0):
    cfg = SCConfig(K=15, weight_trust_region_trajectory=w_tr,
                   solver=TIGHT)
    res = solve_sc(RocketQuat, RocketQuat.default_params(), cfg)
    res = jax.tree_util.tree_map(np.asarray, res)
    it = int(res.iterations)
    row = {"w_tr": w_tr, "converged": bool(res.converged),
           "iterations": it,
           "sum_delta_final": float(res.sum_delta[max(it - 1, 0)]),
           "nu_norm_final": float(res.norm1_nu[max(it - 1, 0)]),
           "nu_norm_last5": [round(float(v), 6)
                             for v in res.norm1_nu[max(it - 5, 0):it]]}
    out.setdefault("rocketquat_sc_weight_sweep", []).append(row)
    print(json.dumps(row), flush=True)
    if w_tr == 50.0:
        # fixed-point test at the stalled trajectory: warm-start a
        # 1-iteration solve from the stall and measure the step
        cfg1 = dataclasses.replace(cfg, max_iterations=1)
        td_stall = res.td
        res1 = solve_sc(RocketQuat, RocketQuat.default_params(), cfg1,
                        warm_td=jax.tree_util.tree_map(
                            jnp.asarray, td_stall))
        res1 = jax.tree_util.tree_map(np.asarray, res1)
        dx = float(np.max(np.abs(np.asarray(res1.td.X)
                                 - np.asarray(td_stall.X))))
        xs = float(np.max(np.abs(np.asarray(td_stall.X))))
        out["rocketquat_sc_fixed_point"] = {
            "step_rel": dx / max(xs, 1e-30),
            "nu_norm_at_stall": float(res1.norm1_nu[0]),
            "sum_delta_at_stall": float(res1.sum_delta[0]),
        }
        print(json.dumps(out["rocketquat_sc_fixed_point"]), flush=True)

# ---- 3: rocket2d_scvx at 3x budget --------------------------------------
cfg2 = SCvxConfig(K=30, max_iterations=60, solve_budget=90,
                  nondimensionalize=False, backend="dense",
                  l1_split=False, solver=TIGHT)
res2 = solve_scvx(Rocket2D, Rocket2D.default_params(), cfg2)
res2 = jax.tree_util.tree_map(np.asarray, res2)
J = np.asarray(res2.nonlinear_cost)
out["rocket2d_scvx_3x_budget"] = {
    "converged": bool(res2.converged),
    "steps": int(res2.steps),
    "accepted": int(res2.iterations),
    "J_last10": [round(float(v), 6) for v in J[-10:]],
    "trust_final": float(np.asarray(res2.trust_region)),
}
print(json.dumps(out["rocket2d_scvx_3x_budget"]), flush=True)

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "stall_study_r05.json"), "w") as f:
    json.dump(out, f, indent=1)
print("saved")
