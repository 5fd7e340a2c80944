"""fp32-vs-f64 golden parity diagnosis (VERDICT r03 #2).

Runs stock Rocket2D SC in fp32 at a ladder of IPM accuracy settings and
reports the control error vs the f64 golden, plus the per-iteration
norm1_nu / sum_delta histories that drive the trust-weight doubling
(SCAlgorithm.cpp:112-115) — the suspected flip point.

Usage: python tools/diag/fp32_parity.py
"""

import os
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from scpp_tpu.algos.sc import solve_sc  # noqa: E402
from scpp_tpu.configs.algorithms import SCConfig  # noqa: E402
from scpp_tpu.models import Rocket2D  # noqa: E402
from scpp_tpu.solver.ipm import IPMSettings  # noqa: E402

GOLD = np.load("/root/repo/tests/goldens/rocket2d_sc.npz")


def control_err(res):
    U = np.asarray(res.td.U)
    gmax = np.max(np.abs(GOLD["U"]))
    scale = np.maximum(np.max(np.abs(GOLD["U"]), axis=0), 1e-3 * gmax)
    return float(np.max(np.abs(U - GOLD["U"]) / scale))


def run(tag, solver, x64):
    with jax.enable_x64(x64):
        res = solve_sc(Rocket2D, Rocket2D.default_params(),
                       SCConfig(solver=solver))
        res = jax.tree_util.tree_map(np.asarray, res)
    err = control_err(res)
    t_err = abs(float(res.td.t) - float(GOLD["t"])) / float(GOLD["t"])
    print(f"{tag:<28} conv={bool(res.converged)} iters={int(res.iterations)}"
          f" U_err={err:.3e} t_err={t_err:.3e}")
    print("   norm1:", " ".join(f"{v:.1e}" for v in res.norm1_nu[:10]))
    print("   sumd :", " ".join(f"{v:.1e}" for v in res.sum_delta[:10]))
    return res


def main():
    run("f64 tight (golden cfg-ish)",
        IPMSettings(iters=40, eps_feas=1e-8), True)
    run("f64 prod (1e-5, r2)",
        IPMSettings(iters=25, eps_reg=1e-4, eps_feas=1e-5, refine_steps=2),
        True)
    run("fp32 bench (1e-4, r2)",
        IPMSettings(iters=25, eps_reg=1e-4, eps_feas=1e-4, refine_steps=2),
        False)
    run("fp32 tight (1e-5, r3)",
        IPMSettings(iters=30, eps_reg=1e-4, eps_feas=1e-5, refine_steps=3),
        False)
    run("fp32 tighter (1e-6, r4, i40)",
        IPMSettings(iters=40, eps_reg=1e-4, eps_feas=1e-6, refine_steps=4),
        False)


if __name__ == "__main__":
    main()
