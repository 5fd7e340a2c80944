"""Multiple-shooting discretization of the linearized dynamics.

The numerical heart of successive convexification. Behavioral parity with
the reference (scpp_core/include/discretizationImplementation.hpp:38-181,
src/discretization.cpp:9-55): for each trajectory interval k, integrate the
variational ODE of the augmented state

    V = (x, Phi, int Phi^-1 B alpha, [int Phi^-1 B beta], [int Phi^-1 f],
         int Phi^-1 (f - A x - B u))

then recover A_k = Phi(dt), B_k = A_k V_B, C_k = A_k V_C, s_k = A_k V_s,
z_k = A_k V_z, so that  x_{k+1} ~= A_k x_k + B_k u_k (+ C_k u_{k+1})
(+ s_k sigma) + z_k.

TPU-native redesign: the reference's sequential k-loop with adaptive RKF78
becomes a ``vmap`` over all K-1 intervals of a fixed-step RK ``lax.scan``
(intervals are mutually independent — the sequence-parallel axis), and the
four <interpolate_input, variable_time> template variants become static
Python flags resolved at trace time. The augmented state is a tuple of
small matrices rather than a packed (n x cols) matrix: XLA fuses the
blocks anyway and the n x n inverse stays a single small solve.

Free-final-time semantics (variable_time=True): time is normalized to
[0, 1], dt = 1/(K-1), and the dynamics are scaled by sigma = td.t
(discretizationImplementation.hpp:58-62,70-77,103-111); fixed-final-time
instead integrates over physical dt = td.t/(K-1) (:133-138).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import jax.scipy.linalg

from scpp_tpu.models.base import flow_with_jacobians
from scpp_tpu.ops.integrators import integrate_fixed
from scpp_tpu.trajectory import DiscretizationData, TrajectoryData

__all__ = ["multiple_shooting", "exact_linear_discretization"]


def _interval_ode(model, par, u0, u1, time, dt, interpolate_input, variable_time):
    """RHS of the variational ODE (discretizationImplementation.hpp:38-120)."""

    def f(V, t):
        x, Phi, VB, VC, Vs, Vz = V
        u = u0 + (t / dt) * (u1 - u0) if interpolate_input else u0

        fx, A, B = flow_with_jacobians(model, x, u, par)
        if variable_time:
            A = A * time
            B = B * time

        Phi_inv = jnp.linalg.inv(Phi)

        dx = time * fx if variable_time else fx
        dPhi = A @ Phi
        if interpolate_input:
            alpha = (dt - t) / dt
            beta = t / dt
            dVB = Phi_inv @ B * alpha
            dVC = Phi_inv @ B * beta
        else:
            dVB = Phi_inv @ B
            dVC = None
        if variable_time:
            dVs = Phi_inv @ fx
            dVz = Phi_inv @ (-A @ x - B @ u)
        else:
            dVs = None
            dVz = Phi_inv @ (fx - A @ x - B @ u)
        return (dx, dPhi, dVB, dVC, dVs, dVz)

    return f


@partial(jax.jit, static_argnums=(0, 4, 5, 6))
def multiple_shooting(model, par, td: TrajectoryData, sigma=None,
                      substeps: int = 10, method: str = "dopri5",
                      variable_time: bool = None) -> DiscretizationData:
    """Discretize the linearized dynamics around trajectory ``td``.

    ``sigma`` defaults to ``td.t``. ``variable_time`` defaults to True
    exactly when the caller wants the free-final-time variant; passing it
    explicitly keeps the four reference variants (discretization.cpp:42-55)
    selectable.
    """
    with jax.default_matmul_precision("highest"):
        return _multiple_shooting_impl(model, par, td, sigma, substeps,
                                       method, variable_time)


def _multiple_shooting_impl(model, par, td, sigma, substeps, method,
                            variable_time):
    if variable_time is None:
        variable_time = True
    interpolate_input = td.interpolated_input
    K = td.n_X
    n, m = model.state_dim, model.input_dim
    dtype = td.X.dtype

    time = td.t if sigma is None else sigma
    dt = 1.0 / (K - 1)
    dt = dt if variable_time else dt * time

    x0s = td.X[:-1]
    u0s = td.U[: K - 1]
    u1s = td.U[1:K] if interpolate_input else u0s

    def one_interval(x0, u0, u1):
        V0 = (
            x0,
            jnp.eye(n, dtype=dtype),
            jnp.zeros((n, m), dtype),
            jnp.zeros((n, m), dtype) if interpolate_input else None,
            jnp.zeros((n,), dtype) if variable_time else None,
            jnp.zeros((n,), dtype),
        )
        f = _interval_ode(model, par, u0, u1, time, dt,
                          interpolate_input, variable_time)
        _, Phi, VB, VC, Vs, Vz = integrate_fixed(f, V0, 0.0, dt, substeps, method)
        A_k = Phi
        B_k = A_k @ VB
        C_k = A_k @ VC if interpolate_input else None
        s_k = A_k @ Vs if variable_time else None
        z_k = A_k @ Vz
        return A_k, B_k, C_k, s_k, z_k

    A, B, C, s, z = jax.vmap(one_interval)(x0s, u0s, u1s)
    return DiscretizationData(A=A, B=B, z=z, C=C, s=s)


def exact_linear_discretization(model, par, ts, x_eq, u_eq):
    """Equilibrium ZOH discretization via matrix exponential.

    Parity with discretization.cpp:9-40: A, B from expm([[Ac, Bc], [0, 0]] ts)
    and the affine term z from expm([[Ac, f - Ac x - Bc u], [0, 0]] ts).
    """
    fx, A_c, B_c = flow_with_jacobians(model, x_eq, u_eq, par)
    n, m = model.state_dim, model.input_dim
    dtype = x_eq.dtype

    E = jnp.zeros((n + m, n + m), dtype)
    E = E.at[:n, :n].set(A_c).at[:n, n:].set(B_c)
    expE = jax.scipy.linalg.expm(E * ts)
    A = expE[:n, :n]
    B = expE[:n, n:]

    E2 = jnp.zeros((n + 1, n + 1), dtype)
    r = fx - A_c @ x_eq - B_c @ u_eq
    E2 = E2.at[:n, :n].set(A_c).at[:n, n].set(r)
    expE2 = jax.scipy.linalg.expm(E2 * ts)
    z = expE2[:n, n]
    return A, B, z
