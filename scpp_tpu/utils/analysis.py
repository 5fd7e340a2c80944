"""Trajectory analysis helpers.

Parity with scpp/src/commonFunctions.cpp: exponential moving average
(:21-26) and the rotating-frame passenger acceleration analysis (:28-70)
for 6-DoF trajectories, vectorized over nodes.
"""

from __future__ import annotations

import jax.numpy as jnp

from scpp_tpu.trajectory import TrajectoryData

__all__ = ["exp_moving_average", "acceleration_rotating_frame"]


def exp_moving_average(previous_average, period, new_value):
    """(commonFunctions.cpp:21-26)"""
    factor = 2.0 / (period + 1.0)
    return (new_value - previous_average) * factor + previous_average


def acceleration_rotating_frame(td: TrajectoryData, offset, g: float):
    """Per-interval body-frame acceleration felt at a point ``offset`` from
    the CoM of a 6-DoF (RocketQuat-layout) trajectory: impressed +
    centrifugal + Euler terms (commonFunctions.cpp:28-70).

    Returns (K, 3); the last interval repeats the final state like the
    reference's back-padding.
    """
    X = jnp.concatenate([td.X, td.X[-1:]], axis=0)
    K = X.shape[0] - 1
    dt = td.t / K

    v0 = X[:-1, 4:7]
    v1 = X[1:, 4:7]
    w0 = X[:-1, 11:14]
    w1 = X[1:, 11:14]

    w_b = (w1 - w0) / 2.0
    dw_b = (w1 - w0) / dt
    dv_i = (v1 - v0) / dt

    r = jnp.asarray(offset, X.dtype)
    a_centrifugal = -jnp.cross(w_b, jnp.cross(w_b, jnp.broadcast_to(r, w_b.shape)))
    a_euler = -jnp.cross(dw_b, jnp.broadcast_to(r, dw_b.shape))
    a_imp = dv_i + jnp.asarray([0.0, 0.0, g], X.dtype)
    return a_imp + a_centrifugal + a_euler
