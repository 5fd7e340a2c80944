"""Fused discretize/resim kernels vs the unfused implementations."""

import jax
import jax.numpy as jnp
import numpy as np

from scpp_tpu.algos.common import nonlinear_defect_cost
from scpp_tpu.models import RocketQuat
from scpp_tpu.ops.disc_mono import (multiple_shooting_fused,
                                    nonlinear_defect_cost_fused)
from scpp_tpu.ops.discretization import multiple_shooting


def _td(K=8):
    p = RocketQuat.nondimensionalize(RocketQuat.default_params())
    par = RocketQuat.param_vector(p)
    td = RocketQuat.init_trajectory(p, K, True)
    return par, td


def test_disc_fused_matches():
    par, td = _td()
    ref = multiple_shooting(RocketQuat, par, td, substeps=4,
                            variable_time=False)
    got = multiple_shooting_fused(RocketQuat, par, td, substeps=4,
                                  interpret=True)
    for name in ("A", "B", "C", "z"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)), np.asarray(getattr(ref, name)),
            rtol=1e-10, atol=1e-12, err_msg=name)


def test_disc_fused_vmapped():
    par, td = _td()
    tds = jax.tree_util.tree_map(
        lambda a: jnp.stack([a, a * (1.0 + 1e-3)]), td)
    pars = jnp.stack([par, par])
    got = jax.jit(jax.vmap(lambda t_, p_: multiple_shooting_fused(
        RocketQuat, p_, t_, substeps=4, interpret=True).A))(tds, pars)
    for i in range(2):
        td_i = jax.tree_util.tree_map(lambda a: a[i], tds)
        ref = multiple_shooting(RocketQuat, pars[i], td_i, substeps=4,
                                variable_time=False)
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(ref.A),
                                   rtol=1e-9, atol=1e-11)


def test_resim_fused_matches():
    par, td = _td()
    ref = nonlinear_defect_cost(RocketQuat, par, td, 5, "dopri5")
    got = nonlinear_defect_cost_fused(RocketQuat, par, td, 5, "dopri5",
                                      interpret=True)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-10)

    tds = jax.tree_util.tree_map(
        lambda a: jnp.stack([a, a * (1.0 + 1e-3)]), td)
    pars = jnp.stack([par, par])
    J = jax.jit(jax.vmap(lambda t_, p_: nonlinear_defect_cost_fused(
        RocketQuat, p_, t_, 5, "dopri5", interpret=True)))(tds, pars)
    np.testing.assert_allclose(float(J[0]), float(ref), rtol=1e-9)


def test_scvx_fuse_dynamics_end_to_end():
    """solve_scvx(fuse_dynamics=True) matches the unfused pipeline
    bitwise-or-near (same math, same reassociation) on Rocket2D K=8."""
    import dataclasses

    from scpp_tpu.algos.scvx import solve_scvx
    from scpp_tpu.configs.algorithms import SCvxConfig
    from scpp_tpu.models import Rocket2D
    from scpp_tpu.solver.ipm import IPMSettings

    p = Rocket2D.default_params().replace(final_time=jnp.asarray(16.0))
    base = SCvxConfig(K=8, max_iterations=4, solve_budget=6,
                      nondimensionalize=True, substeps=4, sim_substeps=5,
                      solver=IPMSettings(iters=15))
    ref = solve_scvx(Rocket2D, p, base)
    got = solve_scvx(Rocket2D, p,
                     dataclasses.replace(base, fuse_dynamics=True))
    # the fused kernels integrate in normalized time (dt*f reassociated),
    # a ~1-ulp-per-step difference amplified to ~1e-6 over the solve
    np.testing.assert_allclose(np.asarray(got.td.U),
                               np.asarray(ref.td.U), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got.nonlinear_cost), np.asarray(ref.nonlinear_cost),
        rtol=1e-4, atol=1e-7)
