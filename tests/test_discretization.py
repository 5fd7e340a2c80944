"""Multiple-shooting discretization: exactness at the linearization point,
first-order accuracy nearby, and the exact ZOH equilibrium discretization.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from scpp_tpu.models import Rocket2D, RocketQuat
from scpp_tpu.ops.discretization import (
    exact_linear_discretization, multiple_shooting,
)
from scpp_tpu.ops.simulation import simulate


def _propagated(model, par, td, variable_time, substeps=48):
    """Nonlinear propagation over each interval (the discretization oracle)."""
    K = td.n_X
    dt_phys = td.t / (K - 1)
    outs = []
    for k in range(K - 1):
        u0 = td.U[k]
        u1 = td.U[k + 1] if td.interpolated_input else u0
        outs.append(simulate(model, par, dt_phys, u0, u1, td.X[k],
                             substeps=substeps))
    return jnp.stack(outs)


@pytest.mark.parametrize("model", [Rocket2D, RocketQuat])
@pytest.mark.parametrize("interpolate_input", [True, False])
@pytest.mark.parametrize("variable_time", [True, False])
def test_discretization_exact_at_linearization_point(
        model, interpolate_input, variable_time):
    """A_k x_k + B_k u_k (+C_k u_{k+1}) (+s_k sigma) + z_k equals the
    nonlinear flow at the linearization trajectory itself
    (discretizationImplementation.hpp:122-181 semantics)."""
    p = model.nondimensionalize(model.default_params())
    par = model.param_vector(p)
    K = 6
    td = model.init_trajectory(p, K, interpolate_input)

    dd = multiple_shooting(model, par, td, substeps=12,
                           variable_time=variable_time)
    assert dd.interpolated_input == interpolate_input
    assert dd.variable_time == variable_time

    x_pred = jnp.einsum("kij,kj->ki", dd.A, td.X[:-1])
    x_pred += jnp.einsum("kij,kj->ki", dd.B, td.U[: K - 1])
    if interpolate_input:
        x_pred += jnp.einsum("kij,kj->ki", dd.C, td.U[1:K])
    if variable_time:
        x_pred += dd.s * td.t
    x_pred += dd.z

    x_sim = _propagated(model, par, td, variable_time)
    np.testing.assert_allclose(np.asarray(x_pred), np.asarray(x_sim),
                               rtol=1e-7, atol=1e-8)


def test_discretization_first_order_accuracy():
    """Prediction error at a perturbed trajectory shrinks quadratically."""
    model = Rocket2D
    p = model.nondimensionalize(model.default_params())
    par = model.param_vector(p)
    K = 6
    td = model.init_trajectory(p, K, True)
    dd = multiple_shooting(model, par, td, substeps=12, variable_time=False)

    def prediction_error(delta):
        rng = np.random.default_rng(0)
        dX = delta * rng.standard_normal(td.X.shape)
        dU = delta * rng.standard_normal(td.U.shape)
        Xp, Up = td.X + dX, td.U + dU
        x_pred = (jnp.einsum("kij,kj->ki", dd.A, Xp[:-1])
                  + jnp.einsum("kij,kj->ki", dd.B, Up[:-1])
                  + jnp.einsum("kij,kj->ki", dd.C, Up[1:])
                  + dd.z)
        tdp = td.replace(X=Xp, U=Up)
        x_sim = _propagated(model, par, tdp, False)
        return float(jnp.max(jnp.abs(x_pred - x_sim)))

    e1 = prediction_error(1e-3)
    e2 = prediction_error(1e-4)
    # second-order remainder: 10x smaller perturbation -> ~100x smaller error
    assert e2 < e1 / 30


def test_variable_time_sigma_sensitivity():
    """The s_k column is the sensitivity to sigma: perturbing sigma moves the
    prediction like the time-scaled dynamics."""
    model = Rocket2D
    p = model.nondimensionalize(model.default_params())
    par = model.param_vector(p)
    K = 6
    td = model.init_trajectory(p, K, True)
    dd = multiple_shooting(model, par, td, substeps=12, variable_time=True)

    sigma1 = td.t * 1.02
    x_pred = (jnp.einsum("kij,kj->ki", dd.A, td.X[:-1])
              + jnp.einsum("kij,kj->ki", dd.B, td.U[:-1])
              + jnp.einsum("kij,kj->ki", dd.C, td.U[1:])
              + dd.s * sigma1 + dd.z)
    td_scaled = td.replace(t=sigma1)
    x_sim = _propagated(model, par, td_scaled, True)
    err = np.max(np.abs(np.asarray(x_pred) - np.asarray(x_sim)))
    # first-order in (sigma1 - sigma0): small but nonzero
    assert err < 2e-4


def test_exact_linear_discretization_matches_propagation():
    """ZOH equilibrium discretization (discretization.cpp:9-40): for the
    linear(ized) system, x+ = A x + B u + z must match nonlinear propagation
    at the equilibrium and be first-order accurate nearby."""
    model = Rocket2D
    p = model.default_params()
    par = model.param_vector(p)
    x_eq, u_eq = model.operating_point(p)
    ts = 0.25
    A, B, z = exact_linear_discretization(model, par, ts, x_eq, u_eq)

    # at equilibrium: f(x_eq, u_eq) = 0 -> x stays
    x1 = A @ x_eq + B @ u_eq + z
    x_sim = simulate(model, par, ts, u_eq, u_eq, x_eq, substeps=32)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x_sim), atol=1e-10)

    # near equilibrium
    dx = jnp.asarray([1.0, 2.0, 0.5, -0.3, 0.01, 0.005])
    du = jnp.asarray([0.01, 500.0])
    x1 = A @ (x_eq + dx) + B @ (u_eq + du) + z
    x_sim = simulate(model, par, ts, u_eq + du, u_eq + du, x_eq + dx,
                     substeps=32)
    # first-order accurate: only the second-order remainder is left
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x_sim),
                               rtol=2e-3, atol=1e-3)


def test_discretization_vmaps_over_scenarios():
    import jax
    model = Rocket2D
    p = model.nondimensionalize(model.default_params())
    par = model.param_vector(p)
    K = 5
    td = model.init_trajectory(p, K, True)
    tds = jax.tree_util.tree_map(
        lambda a: jnp.stack([a, a * 1.001, a * 0.999]), td)

    dd = jax.vmap(lambda t: multiple_shooting(model, par, t, substeps=8,
                                              variable_time=True))(tds)
    assert dd.A.shape == (3, K - 1, 6, 6)
    assert np.all(np.isfinite(dd.A))
