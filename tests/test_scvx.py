"""End-to-end SCvx on Rocket2D: progress, dynamic feasibility trend, and
batching. Tightened to full convergence criteria once the IPM backend lands
(SURVEY §7 step 4 acceptance)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpp_tpu.algos.common import interval_resimulation
from scpp_tpu.algos.scvx import solve_scvx
from scpp_tpu.configs.algorithms import SCvxConfig
from scpp_tpu.models import Rocket2D
from scpp_tpu.solver.scs import SolverSettings


@pytest.fixture(scope="module")
def scvx_result():
    cfg = SCvxConfig(K=20, max_iterations=12, solve_budget=16,
                     nondimensionalize=True,
                     solver=SolverSettings(iters=3000))
    p = Rocket2D.default_params()
    res = solve_scvx(Rocket2D, p, cfg)
    return cfg, p, res


def test_scvx_progress(scvx_result):
    """Nonlinear defect cost decreases by >10x from the initial guess and
    the final state approaches the target."""
    cfg, p, res = scvx_result
    J = np.asarray(res.nonlinear_cost)
    assert J[-1] < J[0] / 10.0, f"J history {J}"
    assert float(res.max_residual) < 5e-3
    assert int(res.iterations) >= 5

    # final state near target (nondimensional tolerance ~ 1e-2)
    X = np.asarray(res.td.X)
    xf = np.asarray(p.x_final)
    r_scale = float(jnp.linalg.norm(p.x_init[:2]))
    assert np.linalg.norm((X[-1][:4] - xf[:4]) / r_scale) < 5e-2
    assert abs(X[-1][4] - xf[4]) < 1e-2


def test_scvx_near_dynamically_feasible(scvx_result):
    cfg, p, res = scvx_result
    par = Rocket2D.param_vector(p)
    x_end = interval_resimulation(Rocket2D, par, res.td, substeps=16)
    # nondimensional defect scale
    r_scale = float(jnp.linalg.norm(p.x_init[:2]))
    defects = np.max(np.abs(np.asarray(x_end - res.td.X[1:])), axis=1) / r_scale
    assert np.max(defects) < 5e-2, f"defects {defects}"


def test_scvx_vmapped_scenarios():
    """Batched solves over dispersed initial states stay independent:
    batch results match the corresponding single solves."""
    cfg = SCvxConfig(K=10, max_iterations=5, solve_budget=6,
                     nondimensionalize=True,
                     solver=SolverSettings(iters=600))
    p = Rocket2D.default_params()

    offsets = jnp.asarray([0.0, 10.0, -15.0])

    def one(dx):
        pp = p.replace(x_init=p.x_init.at[0].add(dx))
        return solve_scvx(Rocket2D, pp, cfg).td.X

    batched = jax.vmap(one)(offsets)
    single = one(offsets[1])
    np.testing.assert_allclose(np.asarray(batched[1]), np.asarray(single),
                               rtol=1e-6, atol=1e-8)
