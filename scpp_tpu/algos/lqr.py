"""LQR: continuous-time Riccati solver, point stabilization, and
gain-scheduled trajectory tracking.

Behavioral parity with the reference LQR stack:
  - CARE via the matrix-sign-function Newton iteration
    M <- M - (M - M^-1)/2 on the 2n x 2n Hamiltonian, then a full-rank
    solve for P (scpp_core/src/LQR.cpp:7-79),
  - K = R^-1 B' P with a diagonal-R fast path (LQR.cpp:58-79,104),
  - LQRAlgorithm: u = -K (x - x_final) + u_eq at the operating point
    (LQRAlgorithm.cpp:11-33),
  - LQRTracker: a CARE gain at every trajectory node from local
    Jacobians, linearly interpolated in time (LQRTracker.cpp:6-65).

TPU-native redesign: the sign iteration is a fixed-trip ``lax.scan``
(quadratically convergent — 30 doublings exceed f64 range), and the
per-node tracker gains are a single ``vmap`` over nodes instead of a
sequential loop; controllability diagnostics are returned as values
instead of asserts.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from scpp_tpu.models.base import jacobians
from scpp_tpu.trajectory import TrajectoryData

__all__ = ["care_solve", "compute_lqr_gain", "lqr_control",
           "TrackerGains", "build_tracker", "tracker_input"]


def _sign_iteration(M, iters: int = 30):
    """Matrix sign function by Newton iteration (LQR.cpp:7-31)."""

    def body(Mk, _):
        Mnew = Mk - 0.5 * (Mk - jnp.linalg.inv(Mk))
        return Mnew, None

    M_final, _ = jax.lax.scan(body, M, None, length=iters)
    return M_final


def care_solve(Q, R, A, B, iters: int = 30):
    """Solve A'P + PA - P B R^-1 B' P + Q = 0 (LQR.cpp:58-79).

    Returns (P, R_inverse).
    """
    n = A.shape[0]
    # diagonal-R fast path has identical semantics; keep the general inverse
    R_inv = jnp.linalg.inv(R)
    H = jnp.block([[A, -B @ R_inv @ B.T],
                   [-Q, -A.T]])
    M = _sign_iteration(H, iters)
    M11 = M[:n, :n]
    M12 = M[:n, n:]
    M21 = M[n:, :n]
    M22 = M[n:, n:]
    I = jnp.eye(n, dtype=A.dtype)
    U = jnp.concatenate([M12, M22 + I], axis=0)          # (2n, n)
    V = jnp.concatenate([M11 + I, M21], axis=0)
    # P solves U P = -V in the least-squares sense (full-pivot LU solve in
    # the reference, LQR.cpp:50-53)
    P, *_ = jnp.linalg.lstsq(U, -V)
    return P, R_inv


def controllability_rank(A, B):
    """rank [B, AB, ..., A^{n-1}B] (the reference asserts full rank,
    LQR.cpp:87-99); returned as a diagnostic value."""
    n = A.shape[0]
    blocks = [B]
    for _ in range(n - 1):
        blocks.append(A @ blocks[-1])
    C = jnp.concatenate(blocks, axis=1)
    return jnp.linalg.matrix_rank(C)


def compute_lqr_gain(Q, R, A, B, iters: int = 30):
    """K = R^-1 B' P (LQR.cpp:81-109)."""
    P, R_inv = care_solve(Q, R, A, B, iters)
    return R_inv @ (B.T @ P)


@partial(jax.jit, static_argnums=(0,))
def lqr_controller(model, params, state_weights, input_weights):
    """Equilibrium LQR gain about the model operating point
    (LQRAlgorithm.cpp:11-25). Returns (K, x_eq, u_eq)."""
    par = model.param_vector(params)
    x_eq, u_eq = model.operating_point(params)
    A, B = jacobians(model, x_eq, u_eq, par)
    Q = jnp.diag(jnp.asarray(state_weights, A.dtype))
    R = jnp.diag(jnp.asarray(input_weights, A.dtype))
    K = compute_lqr_gain(Q, R, A, B)
    return K, x_eq, u_eq


def lqr_control(K, u_eq, x, x_final):
    """u = -K (x - x_final) + u_eq (LQRAlgorithm.cpp:27-33)."""
    return -K @ (x - x_final) + u_eq


@struct.dataclass
class TrackerGains:
    """Per-node CARE gains along a trajectory (LQRTracker.cpp:6-28)."""

    gains: jnp.ndarray        # (K, m, n)
    td: TrajectoryData


@partial(jax.jit, static_argnums=(0,))
def build_tracker(model, params, td: TrajectoryData, state_weights,
                  input_weights) -> TrackerGains:
    par = model.param_vector(params)
    dtype = td.X.dtype
    Q = jnp.diag(jnp.asarray(state_weights, dtype))
    R = jnp.diag(jnp.asarray(input_weights, dtype))
    K = td.n_X
    # ZOH edge case: node K-2 uses input K-2... the reference evaluates
    # Jacobians at (X[k], U[k]) with U[k-1] at the second-to-last node for
    # ZOH (LQRTracker.cpp:17-24); for FOH U has K entries
    if td.interpolated_input:
        U_nodes = td.U
    else:
        U_nodes = jnp.concatenate([td.U, td.U[-1:]], axis=0)

    def gain(x, u):
        A, B = jacobians(model, x, u, par)
        return compute_lqr_gain(Q, R, A, B)

    gains = jax.vmap(gain)(td.X, U_nodes)
    return TrackerGains(gains=gains, td=td)


def tracker_input(tr: TrackerGains, t, x):
    """u = -K(t) (x - x_ref(t)) + u_ref(t) with linear gain interpolation
    (LQRTracker.cpp:43-65)."""
    td = tr.td
    K = td.n_X
    t = jnp.clip(t, 0.0, td.t)
    dt = td.t / (K - 1)
    i = jnp.clip(jnp.floor(t / dt).astype(jnp.int32), 0, K - 2)
    frac = t / dt - i
    K0 = tr.gains[i]
    K1 = tr.gains[jnp.minimum(i + 1, K - 1)] if td.interpolated_input \
        else tr.gains[i]
    K_t = K0 + frac * (K1 - K0)
    x_ref = td.state_at_time(t)
    u_ref = td.input_at_time(t)
    return -K_t @ (x - x_ref) + u_ref
