"""Compiled-TPU smoke suite (`pytest -m tpu`).

The CPU suite pins `jax_platforms=cpu` (tests/conftest.py), so until r03
the only compiled-TPU coverage was the Pallas subprocess check and
bench.py itself — and the r02 lesson (interpreter mode hid a Mosaic
lowering crash) says compiled-path regressions need a gate cheaper than
the 6-minute bench. This module runs ONE fresh subprocess against the
attached chip (sharing bench.py's persistent compilation cache) with four
small checks:

  1. staged IPM on a flagship RocketQuat K=30 SCvx subproblem, fp32:
     relgap + primal/dual residuals under the production eps_feas;
  2. a tiny batch=2 solve_scvx (Rocket2D, K=10): converges, finite;
  3. the Pallas SOC kernel compiled (Mosaic lowering + values);
  4. fp32 stock Rocket2D SC solve: converges and lands in the golden
     defect-cost basin (the cheap slice of test_goldens' fp32 gate).

Skipped (not failed) when no TPU is attached or the tunnel is
unresponsive, mirroring test_pallas.py. NOTE: the attached chip is a
single-client tunnel — don't run this concurrently with bench.py.
"""

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SMOKE = """
import json, time
import jax
import numpy as np

tpus = [d for d in jax.devices() if d.platform == "tpu"]
if not tpus:
    print("SKIP"); raise SystemExit(0)

# share the bench compilation cache (keyed by machine, see bench.py)
import hashlib, platform
try:
    with open("/proc/cpuinfo") as f:
        flags = next((ln for ln in f if ln.startswith("flags")), "")
except OSError:
    flags = ""
tag = hashlib.sha256((platform.machine() + flags).encode()).hexdigest()[:12]
import os as _os
jax.config.update("jax_compilation_cache_dir",
                  _os.environ.get("JAX_CACHE_DIR", f"/tmp/jax_cache_{tag}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
out = {}

# --- 1. staged IPM on one flagship subproblem -------------------------
from scpp_tpu.algos.staged_problems import build_scvx_subproblem_staged
from scpp_tpu.models import Rocket2D, RocketQuat
from scpp_tpu.ops.discretization import multiple_shooting
from scpp_tpu.solver.ipm import IPMSettings
from scpp_tpu.solver.ipm_staged import solve_staged_ipm

params = RocketQuat.default_params()
p = RocketQuat.nondimensionalize(params)
par = RocketQuat.param_vector(p)
td = RocketQuat.init_trajectory(p, 30, True)
ref = RocketQuat.constraint_ref(p, td)
dtype = td.X.dtype
dd = multiple_shooting(RocketQuat, par, td, substeps=6, variable_time=False)
prog = build_scvx_subproblem_staged(
    RocketQuat, p, td, dd, jnp.asarray(5.0, dtype), jnp.asarray(1e3, dtype),
    ref, None)
s = IPMSettings(iters=25, eps_reg=1e-4, eps_feas=1e-4, refine_steps=2)
res = solve_staged_ipm(prog, s)
out["ipm"] = {"res_pri": float(res.res_pri), "res_dua": float(res.res_dua),
              "res_gap": float(res.res_gap)}
# fp32-on-TPU bounds: feasibility is tight, but the duality gap of a
# COLD flagship subproblem floors at the fp32 factorization limit
# (~sqrt(eps32) relative; see PARITY.md "fp32 accuracy model") — the
# production path closes the remaining gap through SCvx warm starts and
# resimulation-guarded accepts (checks 2 and 4 below)
assert float(res.res_pri) < 1e-3 and float(res.res_dua) < 1e-2, out["ipm"]
assert np.isfinite(float(res.res_gap)) and float(res.res_gap) < 1.0, \
    out["ipm"]

# --- 2. batch=2 dispersed stock SC (batched solve + golden basin) -----
# (stock Rocket2D SC converges in ~6 iterations for scale-1 dispersions;
# the K=10 SCvx shrink-to-zero config diverges by design and is not a
# health check)
from scpp_tpu.algos.sc import solve_sc
from scpp_tpu.configs.algorithms import SCConfig
from scpp_tpu.parallel.scenarios import disperse_initial_state

cfg = SCConfig(solver=IPMSettings(iters=25, eps_reg=1e-4, eps_feas=1e-4,
                                  refine_steps=2))
pb = disperse_initial_state(Rocket2D, Rocket2D.default_params(),
                            jax.random.PRNGKey(0), 2, scale=1.0)
r2 = jax.jit(jax.vmap(lambda q: solve_sc(Rocket2D, q, cfg)))(pb)
conv = np.asarray(r2.converged)
out["sc2"] = {"converged": int(conv.sum()),
              "finite": bool(np.isfinite(np.asarray(r2.td.U)).all()),
              "t": [float(v) for v in np.asarray(r2.td.t)]}
assert out["sc2"]["finite"]
assert conv.all(), out["sc2"]

# --- 3. Pallas SOC kernel compiled ------------------------------------
from scpp_tpu.ops.soc_pallas import (soc_project_blocks,
                                     soc_project_blocks_reference)
rng = np.random.default_rng(0)
blocks = (rng.standard_normal((30, 3)) * 3.0).astype(np.float32)
kout = soc_project_blocks(jnp.asarray(blocks), 3, False)
kref = soc_project_blocks_reference(jnp.asarray(blocks))
out["pallas"] = float(jnp.max(jnp.abs(kout - kref)))
assert out["pallas"] < 1e-5, out["pallas"]

# --- 3b. fused CR solve COMPILED + kkt_fused end-to-end ---------------
# (advisor r04: the interpreter-only coverage hid the exact r02 Mosaic
# failure mode this kernel exists to avoid)
from scpp_tpu.solver.cr_pallas import cr_pack, cr_solve_fused
from scpp_tpu.solver.staged_kkt import cr_factor, cr_solve

rngk = np.random.default_rng(3)
Kk, pk, qk = 12, 8, 4
wk = pk + qk
Ak = rngk.standard_normal((Kk, wk, wk)).astype(np.float32)
Dk = np.einsum("nij,nkj->nik", Ak, Ak) + 4 * np.eye(wk, dtype=np.float32)
Dk[:, pk:, pk:] *= -1.0
Dk[:, pk:, :pk] *= 0.3
Dk[:, :pk, pk:] = np.swapaxes(Dk[:, pk:, :pk], 1, 2)
Ok = (0.2 * rngk.standard_normal((Kk - 1, wk, wk))).astype(np.float32)
bk = rngk.standard_normal((Kk, wk)).astype(np.float32)
factk = cr_factor(jnp.asarray(Dk), jnp.asarray(Ok), pk)
packedk, p_out = cr_pack(factk, Kk)
x_fused = np.asarray(cr_solve_fused(packedk, jnp.asarray(bk), p_out,
                                    False))          # compiled Mosaic
x_ref = np.asarray(cr_solve(factk, jnp.asarray(bk)))
out["cr_fused"] = float(np.abs(x_fused - x_ref).max())
assert out["cr_fused"] < 1e-3, out["cr_fused"]

res_kf = solve_staged_ipm(prog, s.replace(kkt_fused=True))
out["kkt_fused"] = {"res_pri": float(res_kf.res_pri),
                    "dx": float(jnp.max(jnp.abs(res_kf.x_stage
                                                - res.x_stage)))}
assert float(res_kf.res_pri) < 1e-3, out["kkt_fused"]

# --- 3c. monolithic fused IPM COMPILED vs unfused ---------------------
from scpp_tpu.solver.ipm_mono import mono_supported, solve_staged_ipm_mono
assert mono_supported(prog, s)
res_m = solve_staged_ipm_mono(prog, s)
out["mono"] = {"res_pri": float(res_m.res_pri),
               "res_gap": float(res_m.res_gap),
               "dobj": abs(float(res_m.obj) - float(res.obj))}
assert float(res_m.res_pri) < 1e-3, out["mono"]
assert np.isfinite(float(res_m.res_gap)), out["mono"]
assert out["mono"]["dobj"] < 1e-2 * (1 + abs(float(res.obj))), out["mono"]

# --- 4. golden cost basin from the batched SC run above ---------------
# (dispersed scale-1 initial states land within a few % of the stock
# golden final time)
g = np.load(_os.path.join({repo!r}, "tests/goldens/rocket2d_sc.npz"))
t_errs = [abs(tv - float(g["t"])) / float(g["t"]) for tv in out["sc2"]["t"]]
out["sc2"]["t_err_vs_golden"] = t_errs
assert max(t_errs) < 0.05, out["sc2"]

print("PASS " + json.dumps(out))
"""


@pytest.mark.tpu
def test_tpu_smoke():
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        filter(None, [env.get("PYTHONPATH"), _REPO]))
    try:
        r = subprocess.run(
            [sys.executable, "-c", _SMOKE.replace("{repo!r}", repr(_REPO))],
            env=env, capture_output=True, text=True, timeout=900)
    except subprocess.TimeoutExpired:
        pytest.skip("TPU attached but unresponsive within 900s")
    out = r.stdout.strip().splitlines()
    assert r.returncode == 0, f"smoke failed:\n{r.stderr[-3000:]}"
    assert out, f"no output:\n{r.stderr[-3000:]}"
    if out[-1] == "SKIP":
        pytest.skip("no TPU attached")
    assert out[-1].startswith("PASS"), out[-1]
