"""Generate frozen golden trajectories (tests/goldens/*.npz).

Regenerates the float64 CPU anchors that tests/test_goldens.py gates on.
Run from the repo root:  python tools/make_goldens.py [name ...]

Each golden is produced with the reference-faithful subproblem encoding
where tractable (dense backend, l1_split=False — the verbatim
nu/nu_bound/norm1_nu chain of SCProblem.cpp:40-77 / SCvxProblem.cpp:40-56)
at stock config budgets. RocketQuat cases use the staged backend (the
dense flat emission at K>=15 with n=14 compiles for tens of minutes);
encoding equivalence staged-vs-dense is separately pinned by
tests/test_staged_backend.py and tests/test_scvx.py on small K.

The C++ reference itself is unbuildable (empty vendored submodules), so
these f64 goldens are the agreed regression anchor standing in for the
<1e-3-vs-C++ contract of BASELINE.json.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from scpp_tpu.algos.sc import solve_sc  # noqa: E402
from scpp_tpu.algos.scvx import solve_scvx  # noqa: E402
from scpp_tpu.configs.algorithms import SCConfig, SCvxConfig  # noqa: E402
from scpp_tpu.models import Rocket2D, RocketQuat  # noqa: E402
from scpp_tpu.solver.ipm import IPMSettings  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")

TIGHT = IPMSettings(iters=40, eps_feas=1e-8)


def golden_configs():
    """name -> (model, algo, cfg). Mirrored EXACTLY in test_goldens.py."""
    return {
        # stock Rocket2D SC.info (K=25, free final time, FOH);
        # reference-faithful dense encoding
        "rocket2d_sc": (Rocket2D, "sc", SCConfig(
            backend="dense", l1_split=False, solver=TIGHT)),
        # stock Rocket2D SCvx.info (K=30, r0=5, 20 iters)
        "rocket2d_scvx": (Rocket2D, "scvx", SCvxConfig(
            K=30, backend="dense", l1_split=False, solver=TIGHT)),
        # stock RocketQuat SC.info (K=15); staged backend (see module doc)
        "rocketquat_sc": (RocketQuat, "sc", SCConfig(
            K=15, weight_trust_region_trajectory=50.0, solver=TIGHT)),
        # flagship RocketQuat SCvx.info (K=30), reference-exact
        # formulation: input-only trust region (SCvxProblem.cpp:58-68;
        # state_trust_region defaults to 0 — see PARITY.md)
        "rocketquat_scvx": (RocketQuat, "scvx", SCvxConfig(
            K=30, max_iterations=30, solve_budget=45, change_threshold=1e-3,
            nondimensionalize=True, substeps=6, sim_substeps=8,
            solver=TIGHT)),
    }


def main():
    os.makedirs(OUT, exist_ok=True)
    names = sys.argv[1:] or list(golden_configs())
    for name in names:
        model, algo, cfg = golden_configs()[name]
        p = model.default_params()
        res = (solve_sc if algo == "sc" else solve_scvx)(model, p, cfg)
        td = res.td
        conv = bool(np.asarray(res.converged))
        print(f"{name}: converged={conv} t={float(td.t):.4f}")
        np.savez(os.path.join(OUT, f"{name}.npz"),
                 X=np.asarray(td.X), U=np.asarray(td.U),
                 t=np.asarray(td.t), converged=conv)


if __name__ == "__main__":
    main()
