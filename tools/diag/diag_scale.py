"""Inspect Ruiz scales of the flagship step-0 subproblem: which column's
cost blows up c_scale, and where b_scale comes from."""
import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from scpp_tpu.configs.algorithms import SCvxConfig
from scpp_tpu.models import RocketQuat
from scpp_tpu.ops.discretization import multiple_shooting
from scpp_tpu.parallel.scenarios import disperse_initial_state
from scpp_tpu.algos.staged_problems import build_scvx_subproblem_staged
from scpp_tpu.solver.ipm_staged import _staged_ruiz

cfg = SCvxConfig(K=30, nondimensionalize=True, substeps=6,
                 state_trust_region=5.0)
params0 = RocketQuat.default_params()
pball = disperse_initial_state(RocketQuat, params0, jax.random.PRNGKey(0),
                               16, scale=2.0)
params = jax.tree_util.tree_map(lambda a: a[0], pball)
p = RocketQuat.nondimensionalize(params)
par = RocketQuat.param_vector(p)
td = RocketQuat.init_trajectory(p, cfg.K, cfg.interpolate_input)
ref = RocketQuat.constraint_ref(p, td)
dtype = td.X.dtype
dd = multiple_shooting(RocketQuat, par, td, substeps=6, variable_time=False)
prog = build_scvx_subproblem_staged(
    RocketQuat, p, td, dd, jnp.asarray(5.0, dtype),
    jnp.asarray(1e3, dtype), ref, jnp.asarray(5.0, dtype))

print("stage_layout:", prog.stage_layout)
E_st, E_g, d_eq, d_c, d_geq, d_cg = _staged_ruiz(prog, 10)
c_sc = np.asarray(prog.c_stage * E_st)
k, j = np.unravel_index(np.argmax(np.abs(c_sc)), c_sc.shape)
print(f"max scaled cost at stage {k} col {j}: c={prog.c_stage[k, j]} "
      f"E={E_st[k, j]:.4e} -> {c_sc[k, j]:.4e}")
# top-10 scaled-cost columns
flat = np.abs(c_sc).ravel()
for idx in np.argsort(flat)[::-1][:10]:
    kk, jj = np.unravel_index(idx, c_sc.shape)
    print(f"  stage {kk:2d} col {jj:2d} c={float(prog.c_stage[kk, jj]):8.1f}"
          f" E={float(E_st[kk, jj]):12.4e} c_scaled={flat[idx]:12.4e}")
# column max |A| over all rows touching each column, original units
Ecat_rows = np.concatenate([np.asarray(prog.A_eq), np.asarray(prog.G)], 1)
w = prog.w
colmax_cur = np.abs(Ecat_rows[:, :, :w]).max(1)
colmax_next = np.abs(Ecat_rows[:, :, w:2 * w]).max(1)
cm = colmax_cur.copy()
cm[1:] = np.maximum(cm[1:], colmax_next[:-1])
print("orig colmax at hot columns:")
for idx in np.argsort(flat)[::-1][:5]:
    kk, jj = np.unravel_index(idx, c_sc.shape)
    print(f"  stage {kk:2d} col {jj:2d} colmax={cm[kk, jj]:.4e}")
# b_scale composition
b_eq = np.asarray(prog.b_eq * d_eq)
h = np.asarray(prog.h * d_c)
print(f"b_scale parts: |b_eq|2={np.linalg.norm(b_eq):.3e} "
      f"|h|2={np.linalg.norm(h):.3e} max|h|={np.abs(h).max():.3e}")
hk, hj = np.unravel_index(np.argmax(np.abs(h)), h.shape)
print(f"max scaled h at stage {hk} row {hj}: h={prog.h[hk, hj]:.3e} "
      f"d_c={d_c[hk, hj]:.3e}")
