"""Fixed-step RK integrators vs scipy high-accuracy reference."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

from scpp_tpu.models import Rocket2D
from scpp_tpu.ops.integrators import integrate_fixed
from scpp_tpu.ops.simulation import simulate


def _scipy_reference(f_np, x0, t1):
    sol = solve_ivp(f_np, (0.0, t1), x0, method="DOP853",
                    rtol=1e-12, atol=1e-12, dense_output=False)
    return sol.y[:, -1]


def test_rk4_and_dopri5_converge_on_nonlinear_ode():
    # stiff-ish nonlinear test ODE
    def f(y, t):
        return jnp.stack([y[1], -jnp.sin(y[0]) - 0.1 * y[1]])

    def f_np(t, y):
        return [y[1], -np.sin(y[0]) - 0.1 * y[1]]

    y0 = jnp.asarray([1.2, 0.0])
    ref = _scipy_reference(f_np, np.asarray(y0), 5.0)

    y_rk4 = integrate_fixed(f, y0, 0.0, 5.0, 200, "rk4")
    y_dp = integrate_fixed(f, y0, 0.0, 5.0, 50, "dopri5")
    np.testing.assert_allclose(y_rk4, ref, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(y_dp, ref, rtol=1e-7, atol=1e-8)


@pytest.mark.parametrize("substeps,tol", [(8, 1e-6), (16, 1e-8)])
def test_simulate_rocket2d_vs_scipy(substeps, tol):
    """simulate() matches adaptive high-order integration of the real model
    to well below the 1e-3 parity budget (simulation.cpp:31-42 analog)."""
    p = Rocket2D.default_params()
    par = Rocket2D.param_vector(p)
    x0 = p.x_init
    u0 = np.asarray([0.05, 260000.0])
    u1 = np.asarray([-0.02, 240000.0])
    dt = 0.5

    def f_np(t, y):
        u = u0 + (t / dt) * (u1 - u0)
        return np.asarray(Rocket2D.flow_map(jnp.asarray(y), jnp.asarray(u), par))

    ref = _scipy_reference(f_np, np.asarray(x0), dt)
    x1 = simulate(Rocket2D, par, dt, jnp.asarray(u0), jnp.asarray(u1), x0,
                  substeps=substeps)
    err = np.linalg.norm(np.asarray(x1) - ref) / np.linalg.norm(ref)
    assert err < tol


def test_pytree_state_integration():
    """The integrator carries tuple-of-array states (variational system)."""
    def f(V, t):
        x, M = V
        return (M @ x, -M)

    x0 = jnp.asarray([1.0, 2.0])
    M0 = jnp.asarray([[0.0, 1.0], [-1.0, 0.0]])
    x1, M1 = integrate_fixed(f, (x0, M0), 0.0, 1.0, 50, "dopri5")
    assert x1.shape == (2,)
    assert M1.shape == (2, 2)
    np.testing.assert_allclose(M1, M0 * np.exp(-1.0), rtol=1e-9)
