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
    """RHS of the variational ODE (discretizationImplementation.hpp:38-120).

    TPU redesign of the reference's packed state: instead of integrating
    Phi and the Phi^-1-premultiplied integrals (which costs an n x n LU
    inverse per RK stage and a trailing unpack matmul per column block),
    integrate the *forward* affine variational equations directly.  By
    variation of constants each reference column Y = Phi(t) int Phi^-1 R
    satisfies Y' = A(t) Y + R(t), Y(0) = 0, so the augmented state is one
    (n, n + m [+ m] [+ 1] + 1) matrix
        Y = [Phi | Y_B | (Y_C) | (y_s) | y_z]
    and the whole RHS is a single batched matmul A @ Y + R — no inverse,
    and A_k..z_k read off Y(dt) with no post-processing.
    """

    def f(V, t):
        x, Y = V
        u = u0 + (t / dt) * (u1 - u0) if interpolate_input else u0

        fx, A, B = flow_with_jacobians(model, x, u, par)
        if variable_time:
            A = A * time
            B = B * time

        dx = time * fx if variable_time else fx
        r = -A @ x - B @ u if variable_time else fx - A @ x - B @ u

        n = x.shape[0]
        cols = [jnp.zeros((n, n), x.dtype)]
        if interpolate_input:
            alpha = (dt - t) / dt
            beta = t / dt
            cols += [B * alpha, B * beta]
        else:
            cols.append(B)
        if variable_time:
            cols.append(fx[:, None])
        cols.append(r[:, None])
        R = jnp.concatenate(cols, axis=1)
        dY = A @ Y + R
        return (dx, dY)

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
        n_cols = n + m + (m if interpolate_input else 0) \
            + (1 if variable_time else 0) + 1
        Y0 = jnp.concatenate(
            [jnp.eye(n, dtype=dtype), jnp.zeros((n, n_cols - n), dtype)],
            axis=1)
        f = _interval_ode(model, par, u0, u1, time, dt,
                          interpolate_input, variable_time)
        _, Y = integrate_fixed(f, (x0, Y0), 0.0, dt, substeps, method)
        A_k = Y[:, :n]
        B_k = Y[:, n:n + m]
        off = n + m
        if interpolate_input:
            C_k = Y[:, off:off + m]
            off += m
        else:
            C_k = None
        if variable_time:
            s_k = Y[:, off]
            off += 1
        else:
            s_k = None
        z_k = Y[:, off]
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
