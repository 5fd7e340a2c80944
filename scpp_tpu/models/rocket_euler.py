"""6-DoF rocket landing with XYZ Euler-angle attitude.

The reference README advertises a "Rocket Landing Model with Euler Angles"
(README.md:24-25) but no source exists in the snapshot; only its math
helpers survive (common.hpp:40-52,98-110). This model re-derives it from
RocketQuat (rocketQuat.cpp:7-37): identical translational dynamics, with
attitude parameterized by intrinsic x-y'-z'' Euler angles and kinematics
eta_dot = M(eta) w_B (common.hpp:98-110). Gimbal-lock singularity at
pitch = +-90 deg is inherent to the parameterization.

State (m, r(3), v(3), rpy(3), w(3)) n=13; input (thrust(3), roll torque).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from scpp_tpu.models.mathlib import (
    deg2rad, euler_xyz_kinematics, euler_xyz_to_quat, quat_to_rotmat,
)
from scpp_tpu.trajectory import TrajectoryData

__all__ = ["RocketEuler", "RocketEulerParams"]


@struct.dataclass
class RocketEulerParams:
    alpha_m: jnp.ndarray
    g_I: jnp.ndarray
    J_B: jnp.ndarray
    r_T_B: jnp.ndarray
    T_min: jnp.ndarray
    T_max: jnp.ndarray
    t_max: jnp.ndarray
    gamma_gs: jnp.ndarray
    gimbal_max: jnp.ndarray
    theta_max: jnp.ndarray
    w_B_max: jnp.ndarray
    x_init: jnp.ndarray        # (13,)
    x_final: jnp.ndarray       # (13,)
    final_time: jnp.ndarray
    m_scale: jnp.ndarray = struct.field(default_factory=lambda: jnp.ones(()))
    r_scale: jnp.ndarray = struct.field(default_factory=lambda: jnp.ones(()))
    exact_minimum_thrust: bool = struct.field(pytree_node=False, default=True)
    enable_roll_control: bool = struct.field(pytree_node=False, default=False)


class RocketEuler:
    name = "RocketEuler"
    state_dim = 13  # m, r(3), v(3), rpy(3), w(3)
    input_dim = 4
    param_dim = 10
    Params = RocketEulerParams

    @staticmethod
    def default_params(dtype=None) -> RocketEulerParams:
        """Same physical configuration as the stock RocketQuat (Falcon-9)."""
        f = (lambda v: jnp.asarray(v, dtype=dtype))
        I_sp = 275.0
        g = 9.81
        x_init = jnp.concatenate([
            f([24000.0]),
            f([200.0, 200.0, 800.0]),
            f([-40.0, -40.0, -80.0]),
            deg2rad(f([-20.0, 20.0, 0.0])),
            deg2rad(f([0.0, 0.0, 0.0])),
        ])
        x_final = jnp.concatenate([
            f([22000.0]),
            f([0.0, 0.0, 0.0]),
            f([0.0, 0.0, 0.0]),
            deg2rad(f([0.0, 0.0, 0.0])),
            deg2rad(f([0.0, 0.0, 0.0])),
        ])
        return RocketEulerParams(
            alpha_m=f(1.0 / (I_sp * g)),
            g_I=f([0.0, 0.0, -g]),
            J_B=f([5_000_000.0, 5_000_000.0, 70_000.0]),
            r_T_B=f([0.0, 0.0, -15.0]),
            T_min=f(200_000.0),
            T_max=f(420_000.0),
            t_max=f(17_500.0),
            gamma_gs=deg2rad(f(30.0)),
            gimbal_max=deg2rad(f(15.0)),
            theta_max=deg2rad(f(60.0)),
            w_B_max=deg2rad(f(60.0)),
            x_init=x_init,
            x_final=x_final,
            final_time=f(12.0),
        )

    @staticmethod
    def from_info(path: str, dtype=None, **overrides) -> RocketEulerParams:
        """Load physics + boundary conditions from a RocketQuat-format
        ``model.info`` (same file layout; the rpy_init/rpy_final blocks map
        directly onto the Euler-angle state instead of a quaternion)."""
        from scpp_tpu.utils.info_parser import InfoFile
        f = InfoFile(path)
        g = (lambda v: jnp.asarray(v, dtype=dtype))
        g_I = g(f.load_vector("g_I", 3))
        I_sp = f.load_scalar("I_sp")
        p = RocketEulerParams(
            alpha_m=1.0 / (I_sp * jnp.abs(g_I[2])),
            g_I=g_I,
            J_B=g(f.load_vector("J_B", 3)),
            r_T_B=g(f.load_vector("r_T_B", 3)),
            T_min=g(f.load_scalar("T_min")),
            T_max=g(f.load_scalar("T_max")),
            t_max=g(f.load_scalar("t_max")),
            gamma_gs=deg2rad(g(f.load_scalar("gamma_gs"))),
            gimbal_max=deg2rad(g(f.load_scalar("gimbal_max"))),
            theta_max=deg2rad(g(f.load_scalar("theta_max"))),
            w_B_max=deg2rad(g(f.load_scalar("w_B_max"))),
            x_init=jnp.concatenate([
                g(f.load_scalar("m_init"))[None],
                g(f.load_vector("r_init", 3)), g(f.load_vector("v_init", 3)),
                deg2rad(g(f.load_vector("rpy_init", 3))),
                deg2rad(g(f.load_vector("w_init", 3)))]),
            x_final=jnp.concatenate([
                g(f.load_scalar("m_dry"))[None],
                g(f.load_vector("r_final", 3)), g(f.load_vector("v_final", 3)),
                deg2rad(g(f.load_vector("rpy_final", 3))),
                deg2rad(g(f.load_vector("w_final", 3)))]),
            final_time=g(f.load_scalar("final_time")),
            exact_minimum_thrust=f.load_scalar("exact_minimum_thrust", bool),
            enable_roll_control=f.load_scalar("enable_roll_control", bool),
        )
        return p.replace(**overrides) if overrides else p

    @staticmethod
    def param_vector(p: RocketEulerParams) -> jnp.ndarray:
        return jnp.concatenate([p.alpha_m[None], p.g_I, p.J_B, p.r_T_B])

    @staticmethod
    def flow_map(x, u, par):
        alpha_m = par[0]
        g_I = par[1:4]
        J_B = par[4:7]
        r_T_B = par[7:10]

        m = x[0]
        v = x[4:7]
        eta = x[7:10]
        w = x[10:13]

        thrust = u[:3]
        torque = jnp.stack([jnp.zeros_like(u[3]), jnp.zeros_like(u[3]), u[3]])

        R_I_B = quat_to_rotmat(euler_xyz_to_quat(eta))

        mdot = -alpha_m * jnp.linalg.norm(thrust)
        rdot = v
        vdot = (R_I_B @ thrust) / m + g_I
        etadot = euler_xyz_kinematics(eta) @ w
        wdot = (jnp.cross(r_T_B, thrust) + torque) / J_B
        return jnp.concatenate([mdot[None], rdot, vdot, etadot, wdot])

    @staticmethod
    def operating_point(p: RocketEulerParams):
        x_eq = jnp.zeros(13, dtype=p.x_init.dtype)
        x_eq = x_eq.at[0].set(p.x_final[0])
        u_eq = jnp.concatenate([
            jnp.zeros(2, p.x_init.dtype),
            (-p.g_I[2] * p.x_final[0])[None],
            jnp.zeros(1, p.x_init.dtype)])
        return x_eq, u_eq

    @staticmethod
    def init_trajectory(p: RocketEulerParams, K: int, interpolate_input: bool) -> TrajectoryData:
        dtype = p.x_init.dtype
        k = jnp.arange(K, dtype=dtype)
        a1 = ((K - k) / K)[:, None]
        a2 = (k / K)[:, None]
        X = a1 * p.x_init[None, :] + a2 * p.x_final[None, :]
        n_U = K if interpolate_input else K - 1
        u_hold = jnp.concatenate([
            jnp.zeros(2, dtype), ((p.T_max - p.T_min) / 2)[None],
            jnp.zeros(1, dtype)])
        U = jnp.tile(u_hold[None, :], (n_U, 1))
        return TrajectoryData(X=X, U=U, t=p.final_time)

    @staticmethod
    def constraint_ref(p: RocketEulerParams, td: TrajectoryData):
        if not p.exact_minimum_thrust:
            return ()
        thrust = td.U[:, :3]
        norm = jnp.linalg.norm(thrust, axis=1, keepdims=True)
        return (thrust / jnp.maximum(norm, 1e-30),)

    @staticmethod
    def constraints(pb, v_X, v_U, p: RocketEulerParams, ref=()):
        K = v_X.shape[0]
        n_U = v_U.shape[0]

        pb.add_eq(v_X[0] - p.x_init)
        # final state pinned except mass (0) and roll angle (9): free roll
        for i in (1, 2, 3, 4, 5, 6, 7, 8, 10, 11, 12):
            pb.add_eq(v_X[K - 1, i] - p.x_final[i])

        pb.add_nonneg(v_X[:, 0] - p.x_final[0])

        tan_gs = jnp.tan(p.gamma_gs)
        tan_gimbal = jnp.tan(p.gimbal_max)
        for k in range(K):
            pb.add_soc(tan_gs * v_X[k, 3], v_X[k, 1:3])
            # tilt as a box on roll/pitch Euler angles
            pb.add_soc(p.theta_max + 0.0 * v_X[k, 0], v_X[k, 7:9])
            pb.add_soc(p.w_B_max + 0.0 * v_X[k, 0], v_X[k, 10:13])

        pb.add_eq(v_U[n_U - 1, 0])
        pb.add_eq(v_U[n_U - 1, 1])
        pb.add_eq(v_U[n_U - 1, 3])

        if p.exact_minimum_thrust:
            (n_hat,) = ref
            for k in range(n_U):
                pb.add_nonneg(n_hat[k] @ v_U[k, 0:3] - p.T_min)
        else:
            pb.add_nonneg(v_U[:, 2] - p.T_min)

        for k in range(n_U):
            pb.add_soc(p.T_max + 0.0 * v_U[k, 3], v_U[k, 0:3])
            pb.add_soc(tan_gimbal * v_U[k, 2], v_U[k, 0:2])

        if p.enable_roll_control:
            pb.add_nonneg(p.t_max - v_U[:, 3])
            pb.add_nonneg(v_U[:, 3] + p.t_max)
        else:
            pb.add_eq(v_X[:, 12])
            pb.add_eq(v_U[:, 3])

    # final-state components pinned at node K-1: all except mass (0) and
    # roll angle (9): free roll
    _FINAL_PIN = (1, 2, 3, 4, 5, 6, 7, 8, 10, 11, 12)

    @staticmethod
    def constraints_staged(sb, x, u, p: RocketEulerParams, ref=(), n_U=None):
        """Same constraint set as :meth:`constraints`, emitted as vectorized
        node families for the stage-banded builder."""
        K = sb.K
        n_U = K if n_U is None else n_U
        un = np.arange(n_U)
        pin = list(RocketEuler._FINAL_PIN)

        sb.eq(x.sel() - p.x_init, nodes=[0])
        sb.eq(x.sel(pin) - p.x_final[jnp.asarray(pin)], nodes=[K - 1])

        sb.nonneg(x.sel(0) - p.x_final[0])

        sb.soc(x.sel(3) * jnp.tan(p.gamma_gs), x.sel([1, 2]))
        # tilt as a 2-norm bound on roll/pitch Euler angles
        sb.soc(p.theta_max, x.sel([7, 8]))
        sb.soc(p.w_B_max, x.sel([10, 11, 12]))

        sb.eq(u.sel([0, 1, 3]), nodes=[n_U - 1])

        if p.exact_minimum_thrust:
            (n_hat,) = ref
            sb.nonneg(u.lin(n_hat[:, None, :], idx=[0, 1, 2]) - p.T_min,
                      nodes=un)
        else:
            sb.nonneg(u.sel(2) - p.T_min, nodes=un)

        sb.soc(p.T_max, u.sel([0, 1, 2]), nodes=un)
        sb.soc(u.sel(2) * jnp.tan(p.gimbal_max), u.sel([0, 1]), nodes=un)

        if p.enable_roll_control:
            sb.nonneg(-u.sel(3) + p.t_max, nodes=un)
            sb.nonneg(u.sel(3) + p.t_max, nodes=un)
        else:
            sb.eq(x.sel(12))
            sb.eq(u.sel(3), nodes=un)

    @staticmethod
    def clamp_input(p: RocketEulerParams, u):
        """Clamp into the thrust cone (same pattern as RocketQuat)."""
        tz = jnp.maximum(u[2], p.T_min)
        txy = u[:2]
        cone = jnp.tan(p.gimbal_max) * tz
        nxy = jnp.linalg.norm(txy)
        txy = jnp.where(nxy > cone, txy * (cone / jnp.maximum(nxy, 1e-30)), txy)
        T = jnp.concatenate([txy, tz[None]])
        nT = jnp.linalg.norm(T)
        T = jnp.where(nT > p.T_max, T * (p.T_max / nT), T)
        return jnp.concatenate([T, u[3:4]])

    @staticmethod
    def disperse_x_init(p: RocketEulerParams, key, scale):
        """Feasible initial-state dispersion (see RocketQuat.disperse_x_init;
        attitude is perturbed directly in XYZ Euler angles)."""
        kr, kv, ka, kw = jax.random.split(key, 4)
        dtype = p.x_init.dtype
        s = jnp.asarray(scale, dtype)
        r_xy = p.x_init[1:3] + s * jax.random.normal(kr, (2,), dtype)
        lim = 0.95 * jnp.tan(p.gamma_gs) * p.x_init[3]
        nrm = jnp.linalg.norm(r_xy)
        r_xy = r_xy * jnp.minimum(1.0, lim / jnp.maximum(nrm, 1e-30))
        v = p.x_init[4:7] + 0.2 * s * jax.random.normal(kv, (3,), dtype)
        frac = jnp.minimum(s / 10.0, 1.0)
        d_rp = frac * 0.3 * p.theta_max * \
            jax.random.uniform(ka, (2,), dtype, -1.0, 1.0)
        rp = jnp.clip(p.x_init[7:9] + d_rp,
                      -0.45 * p.theta_max, 0.45 * p.theta_max)
        w = p.x_init[10:13] + frac * 0.3 * p.w_B_max * \
            jax.random.uniform(kw, (3,), dtype, -1.0, 1.0)
        wn = jnp.linalg.norm(w)
        w = w * jnp.minimum(1.0, 0.9 * p.w_B_max / jnp.maximum(wn, 1e-30))
        return jnp.concatenate([p.x_init[0:1], r_xy, p.x_init[3:4], v,
                                rp, p.x_init[9:10], w])

    @staticmethod
    def _state_scale(m_scale, r_scale, dtype):
        return jnp.concatenate([
            m_scale[None].astype(dtype) if m_scale.ndim == 0 else m_scale,
            jnp.full((6,), r_scale, dtype),
            jnp.ones((6,), dtype),
        ])

    @staticmethod
    def nondimensionalize(p: RocketEulerParams) -> RocketEulerParams:
        m_scale = p.x_init[0]
        r_scale = jnp.linalg.norm(p.x_init[1:4])
        x_div = RocketEuler._state_scale(m_scale, r_scale, p.x_init.dtype)
        return p.replace(
            alpha_m=p.alpha_m * r_scale,
            r_T_B=p.r_T_B / r_scale,
            g_I=p.g_I / r_scale,
            J_B=p.J_B / (m_scale * r_scale**2),
            x_init=p.x_init / x_div,
            x_final=p.x_final / x_div,
            T_min=p.T_min / (m_scale * r_scale),
            T_max=p.T_max / (m_scale * r_scale),
            t_max=p.t_max / (m_scale * r_scale**2),
            m_scale=m_scale,
            r_scale=r_scale,
        )

    @staticmethod
    def redimensionalize(p: RocketEulerParams) -> RocketEulerParams:
        m_scale, r_scale = p.m_scale, p.r_scale
        x_mul = RocketEuler._state_scale(m_scale, r_scale, p.x_init.dtype)
        return p.replace(
            alpha_m=p.alpha_m / r_scale,
            r_T_B=p.r_T_B * r_scale,
            g_I=p.g_I * r_scale,
            J_B=p.J_B * (m_scale * r_scale**2),
            x_init=p.x_init * x_mul,
            x_final=p.x_final * x_mul,
            T_min=p.T_min * (m_scale * r_scale),
            T_max=p.T_max * (m_scale * r_scale),
            t_max=p.t_max * (m_scale * r_scale**2),
        )

    @staticmethod
    def scale_trajectory(p: RocketEulerParams, td: TrajectoryData) -> TrajectoryData:
        x_div = RocketEuler._state_scale(p.m_scale, p.r_scale, td.X.dtype)
        u_div = jnp.concatenate([
            jnp.full((3,), p.m_scale * p.r_scale, td.U.dtype),
            (p.m_scale * p.r_scale**2)[None]])
        return td.replace(X=td.X / x_div, U=td.U / u_div)

    @staticmethod
    def unscale_trajectory(p: RocketEulerParams, td: TrajectoryData) -> TrajectoryData:
        x_mul = RocketEuler._state_scale(p.m_scale, p.r_scale, td.X.dtype)
        u_mul = jnp.concatenate([
            jnp.full((3,), p.m_scale * p.r_scale, td.U.dtype),
            (p.m_scale * p.r_scale**2)[None]])
        return td.replace(X=td.X * x_mul, U=td.U * u_mul)
