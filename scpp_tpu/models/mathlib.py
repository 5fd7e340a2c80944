"""Rotation / quaternion helpers in jnp, differentiable end to end.

Behavioral parity with the reference model math helpers
(scpp_models/include/common.hpp:20-146), re-derived for stacked-array JAX:
quaternions are (w, x, y, z) vectors, everything is a pure function of
arrays so it batches under vmap and differentiates under jacfwd.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "deg2rad", "quat_mul", "quat_to_rotmat", "rot2d", "omega_matrix",
    "euler_xyz_to_quat", "quat_to_euler_xyz", "slerp", "euler_xyz_kinematics",
]


def deg2rad(x):
    return jnp.asarray(x) * (jnp.pi / 180.0)


def rot2d(angle):
    """2x2 rotation matrix (Eigen::Rotation2D equivalent)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.array([[c, -s], [s, c]])


def quat_mul(q1, q2):
    """Hamilton product of (w,x,y,z) quaternions."""
    w1, x1, y1, z1 = q1
    w2, x2, y2, z2 = q2
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def quat_to_rotmat(q):
    """Rotation matrix of a (w,x,y,z) quaternion.

    Matches Eigen's toRotationMatrix on *raw* components (no normalization),
    which is what the taped dynamics in the reference differentiate through
    (rocketQuat.cpp:29-30): intermediate SC iterates need not be unit.
    """
    w, x, y, z = q
    return jnp.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def omega_matrix(w):
    """4x4 quaternion-rate matrix Omega(w): q_dot = 0.5 * Omega(w) q.

    Parity: common.hpp:124-134.
    """
    w0, w1, w2 = w
    zero = jnp.zeros_like(w0)
    return jnp.array([
        [zero, -w0, -w1, -w2],
        [w0, zero, w2, -w1],
        [w1, -w2, zero, w0],
        [w2, w1, -w0, zero],
    ])


def _axis_angle_quat(axis_idx: int, angle):
    half = 0.5 * angle
    q = [jnp.cos(half), 0.0, 0.0, 0.0]
    q[1 + axis_idx] = jnp.sin(half)
    return jnp.stack([jnp.asarray(c, dtype=jnp.result_type(angle)) if not hasattr(c, "dtype") else c for c in q])


def euler_xyz_to_quat(eta):
    """Intrinsic x-y'-z'' Euler angles -> quaternion (common.hpp:29-38)."""
    qx = _axis_angle_quat(0, eta[0])
    qy = _axis_angle_quat(1, eta[1])
    qz = _axis_angle_quat(2, eta[2])
    return quat_mul(quat_mul(qx, qy), qz)


def quat_to_euler_xyz(q):
    """Inverse of euler_xyz_to_quat (common.hpp:65-73)."""
    R = quat_to_rotmat(q)
    phi = jnp.arctan2(-R[1, 2], R[2, 2])
    theta = jnp.arcsin(R[0, 2])
    psi = jnp.arctan2(-R[0, 1], R[0, 0])
    return jnp.stack([phi, theta, psi])


def euler_xyz_kinematics(eta):
    """M(eta) with eta_dot = M(eta) @ w_B for the x-y'-z'' sequence.

    Re-derivation of common.hpp:98-110 (rotationJacobianXYZ): body rates map
    to Euler-angle rates through the inverse of the stacked rotated axes.
    Singular at theta = +-90 deg (gimbal lock), as in the reference.
    """
    theta, psi = eta[1], eta[2]
    ct, st = jnp.cos(theta), jnp.sin(theta)
    cp, sp = jnp.cos(psi), jnp.sin(psi)
    M = jnp.array([
        [cp, -sp, jnp.zeros_like(cp)],
        [ct * sp, ct * cp, jnp.zeros_like(cp)],
        [-st * cp, st * sp, ct],
    ])
    return M / ct


def slerp(q0, q1, alpha):
    """Spherical linear interpolation, Eigen-compatible shortest path."""
    d = jnp.dot(q0, q1)
    abs_d = jnp.abs(d)
    # numerically safe angles; fall back to lerp when nearly parallel
    theta = jnp.arccos(jnp.clip(abs_d, 0.0, 1.0))
    sin_theta = jnp.sin(theta)
    near = abs_d > 1.0 - 1e-9
    scale0 = jnp.where(near, 1.0 - alpha, jnp.sin((1.0 - alpha) * theta) / jnp.where(near, 1.0, sin_theta))
    scale1 = jnp.where(near, alpha, jnp.sin(alpha * theta) / jnp.where(near, 1.0, sin_theta))
    scale1 = jnp.where(d < 0, -scale1, scale1)
    return scale0 * q0 + scale1 * q1
