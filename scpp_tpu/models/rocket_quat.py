"""6-DoF quaternion rocket landing model.

Behavioral parity with the reference RocketQuat
(scpp_models/src/rocketQuat.cpp:7-332, include/rocketQuat.hpp:19-98):
state (m, r(3), v(3), q_wxyz(4), w(3)), input (thrust(3), roll torque),
dynamic params (alpha_m, g_I(3), J_B diag(3), r_T_B(3)).

Default physical values correspond to the active (Falcon-9-like) block of
scpp_models/config/RocketQuat/model.info.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from scpp_tpu.models.mathlib import (
    deg2rad, euler_xyz_to_quat, omega_matrix, quat_to_euler_xyz,
    quat_to_rotmat, slerp,
)
from scpp_tpu.trajectory import TrajectoryData

__all__ = ["RocketQuat", "RocketQuatParams"]


@struct.dataclass
class RocketQuatParams:
    # physical
    alpha_m: jnp.ndarray       # mass depletion 1 / (I_sp * |g|)
    g_I: jnp.ndarray           # (3,)
    J_B: jnp.ndarray           # (3,) diagonal inertia
    r_T_B: jnp.ndarray         # (3,) thrust application point
    T_min: jnp.ndarray
    T_max: jnp.ndarray
    t_max: jnp.ndarray         # max roll torque
    # constraint bounds (radians)
    gamma_gs: jnp.ndarray
    gimbal_max: jnp.ndarray
    theta_max: jnp.ndarray
    w_B_max: jnp.ndarray
    # boundary conditions
    x_init: jnp.ndarray        # (14,)
    x_final: jnp.ndarray       # (14,)
    final_time: jnp.ndarray
    # nondimensionalization scales
    m_scale: jnp.ndarray = struct.field(default_factory=lambda: jnp.ones(()))
    r_scale: jnp.ndarray = struct.field(default_factory=lambda: jnp.ones(()))
    # structure flags (static: change the constraint set)
    exact_minimum_thrust: bool = struct.field(pytree_node=False, default=True)
    enable_roll_control: bool = struct.field(pytree_node=False, default=False)


class RocketQuat:
    name = "RocketQuat"
    state_dim = 14  # m, r(3), v(3), q(4), w(3)
    input_dim = 4   # thrust(3), roll torque
    param_dim = 10
    Params = RocketQuatParams

    @staticmethod
    def default_params(dtype=None) -> RocketQuatParams:
        """Falcon-9-like stock configuration (config/RocketQuat/model.info)."""
        f = (lambda v: jnp.asarray(v, dtype=dtype))
        I_sp = 275.0
        g = 9.81
        rpy_init = deg2rad(f([-20.0, 20.0, 0.0]))
        rpy_final = deg2rad(f([0.0, 0.0, 0.0]))
        q_init = euler_xyz_to_quat(rpy_init)
        q_final = euler_xyz_to_quat(rpy_final)
        x_init = jnp.concatenate([
            f([24000.0]),                       # m_init
            f([200.0, 200.0, 800.0]),           # r_init
            f([-40.0, -40.0, -80.0]),           # v_init
            q_init,
            deg2rad(f([0.0, 0.0, 0.0])),        # w_init
        ])
        x_final = jnp.concatenate([
            f([22000.0]),                       # m_dry
            f([0.0, 0.0, 0.0]),
            f([0.0, 0.0, 0.0]),
            q_final,
            deg2rad(f([0.0, 0.0, 0.0])),
        ])
        return RocketQuatParams(
            alpha_m=f(1.0 / (I_sp * g)),
            g_I=f([0.0, 0.0, -g]),
            J_B=f([5_000_000.0, 5_000_000.0, 70_000.0]),
            r_T_B=f([0.0, 0.0, -15.0]),
            T_min=f(200_000.0),
            T_max=f(420_000.0),
            t_max=f(17_500.0),
            gamma_gs=deg2rad(f(30.0)),
            gimbal_max=deg2rad(f(15.0)),
            theta_max=deg2rad(f(90.0)),
            w_B_max=deg2rad(f(60.0)),
            x_init=x_init,
            x_final=x_final,
            final_time=f(12.0),
        )

    @staticmethod
    def from_info(path: str, dtype=None, **overrides) -> RocketQuatParams:
        """Load physics + boundary conditions from a reference-format
        ``model.info`` (rocketQuat.cpp:234-289): angles are degrees,
        attitude is given as XYZ Euler angles and converted to a
        quaternion, alpha_m = 1/(I_sp |g_z|), final mass = m_dry.
        ``random_initial_state`` is accepted and ignored (the reference's
        randomizeInitialState is commented out; use disperse_x_init)."""
        from scpp_tpu.utils.info_parser import InfoFile
        f = InfoFile(path)
        g = (lambda v: jnp.asarray(v, dtype=dtype))
        g_I = g(f.load_vector("g_I", 3))
        I_sp = f.load_scalar("I_sp")
        q_init = euler_xyz_to_quat(deg2rad(g(f.load_vector("rpy_init", 3))))
        q_final = euler_xyz_to_quat(deg2rad(g(f.load_vector("rpy_final", 3))))
        p = RocketQuatParams(
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
                q_init, deg2rad(g(f.load_vector("w_init", 3)))]),
            x_final=jnp.concatenate([
                g(f.load_scalar("m_dry"))[None],
                g(f.load_vector("r_final", 3)), g(f.load_vector("v_final", 3)),
                q_final, deg2rad(g(f.load_vector("w_final", 3)))]),
            final_time=g(f.load_scalar("final_time")),
            exact_minimum_thrust=f.load_scalar("exact_minimum_thrust", bool),
            enable_roll_control=f.load_scalar("enable_roll_control", bool),
        )
        return p.replace(**overrides) if overrides else p

    @staticmethod
    def param_vector(p: RocketQuatParams) -> jnp.ndarray:
        """(rocketQuat.cpp:168-171)"""
        return jnp.concatenate([p.alpha_m[None], p.g_I, p.J_B, p.r_T_B])

    @staticmethod
    def flow_map(x, u, par):
        """xdot = f(x, u) (rocketQuat.cpp:7-37)."""
        alpha_m = par[0]
        g_I = par[1:4]
        J_B = par[4:7]
        r_T_B = par[7:10]

        m = x[0]
        v = x[4:7]
        q = x[7:11]
        w = x[11:14]

        thrust = u[:3]
        torque = jnp.stack([jnp.zeros_like(u[3]), jnp.zeros_like(u[3]), u[3]])

        R_I_B = quat_to_rotmat(q)

        mdot = -alpha_m * jnp.linalg.norm(thrust)
        rdot = v
        # the three small contractions (R @ T, Omega @ q, cross) are
        # expanded component-wise: identical products in identical
        # left-to-right order as the matmul/cross forms, but they also
        # lower inside the fused-dynamics Pallas kernels, where Mosaic
        # rejects tiny accumulator reductions
        Rt = jnp.stack([
            R_I_B[0, 0] * thrust[0] + R_I_B[0, 1] * thrust[1]
            + R_I_B[0, 2] * thrust[2],
            R_I_B[1, 0] * thrust[0] + R_I_B[1, 1] * thrust[1]
            + R_I_B[1, 2] * thrust[2],
            R_I_B[2, 0] * thrust[0] + R_I_B[2, 1] * thrust[1]
            + R_I_B[2, 2] * thrust[2]])
        vdot = Rt / m + g_I
        w0, w1, w2 = w[0], w[1], w[2]
        qdot = 0.5 * jnp.stack([
            -w0 * q[1] - w1 * q[2] - w2 * q[3],
            w0 * q[0] + w2 * q[2] - w1 * q[3],
            w1 * q[0] - w2 * q[1] + w0 * q[3],
            w2 * q[0] + w1 * q[1] - w0 * q[2]])
        # note: the reference subtracts w x w which is identically zero
        # (rocketQuat.cpp:36); both f and its Jacobians are unaffected.
        rxT = jnp.stack([
            r_T_B[1] * thrust[2] - r_T_B[2] * thrust[1],
            r_T_B[2] * thrust[0] - r_T_B[0] * thrust[2],
            r_T_B[0] * thrust[1] - r_T_B[1] * thrust[0]])
        wdot = (rxT + torque) / J_B
        return jnp.concatenate([mdot[None], rdot, vdot, qdot, wdot])

    @staticmethod
    def operating_point(p: RocketQuatParams):
        """Hover: upright attitude, thrust balancing gravity."""
        x_eq = jnp.zeros(14, dtype=p.x_init.dtype).at[7].set(1.0)
        x_eq = x_eq.at[0].set(p.x_final[0])
        u_eq = jnp.concatenate([
            jnp.zeros(2, p.x_init.dtype),
            (-p.g_I[2] * p.x_final[0])[None],
            jnp.zeros(1, p.x_init.dtype)])
        return x_eq, u_eq

    @staticmethod
    def init_trajectory(p: RocketQuatParams, K: int, interpolate_input: bool) -> TrajectoryData:
        """Linear interpolation with quaternion SLERP (rocketQuat.cpp:39-68)."""
        dtype = p.x_init.dtype
        k = jnp.arange(K, dtype=dtype)
        a1 = ((K - k) / K)[:, None]
        a2 = (k / K)[:, None]
        lin = a1 * p.x_init[None, :] + a2 * p.x_final[None, :]
        q0, q1 = p.x_init[7:11], p.x_final[7:11]
        qs = jax.vmap(lambda a: slerp(q0, q1, a))(k / K)
        X = jnp.concatenate([lin[:, :7], qs, lin[:, 11:14]], axis=1)
        n_U = K if interpolate_input else K - 1
        u_hold = jnp.concatenate([
            jnp.zeros(2, dtype), ((p.T_max - p.T_min) / 2)[None],
            jnp.zeros(1, dtype)])
        U = jnp.tile(u_hold[None, :], (n_U, 1))
        return TrajectoryData(X=X, U=U, t=p.final_time)

    # ---- application constraints (rocketQuat.cpp:70-144) ----

    @staticmethod
    def constraint_ref(p: RocketQuatParams, td: TrajectoryData):
        """Linearization point of the exact-minimum-thrust constraint.

        Mirrors updateProblemParameters (rocketQuat.cpp:156-166): normalized
        previous thrust directions, refreshed once per solve() — NOT per
        iteration (SCAlgorithm.cpp:152) — a quirk kept for numeric parity.
        """
        if not p.exact_minimum_thrust:
            return ()
        thrust = td.U[:, :3]
        norm = jnp.linalg.norm(thrust, axis=1, keepdims=True)
        return (thrust / jnp.maximum(norm, 1e-30),)

    @staticmethod
    def constraints(pb, v_X, v_U, p: RocketQuatParams, ref=()):
        K = v_X.shape[0]
        n_U = v_U.shape[0]

        # initial state pinned
        pb.add_eq(v_X[0] - p.x_init)
        # final state pinned except mass (0), q_w (7), q_z (10): free roll
        for i in (1, 2, 3, 4, 5, 6, 8, 9, 11, 12, 13):
            pb.add_eq(v_X[K - 1, i] - p.x_final[i])

        # mass above dry mass
        pb.add_nonneg(v_X[:, 0] - p.x_final[0])

        tan_gs = jnp.tan(p.gamma_gs)
        tilt_const = jnp.sqrt((1.0 - jnp.cos(p.theta_max)) / 2.0)
        tan_gimbal = jnp.tan(p.gimbal_max)
        for k in range(K):
            # glideslope ||r_xy|| <= tan(gamma_gs) * r_z
            pb.add_soc(tan_gs * v_X[k, 3], v_X[k, 1:3])
            # tilt ||q_xy|| <= sqrt((1-cos(theta_max))/2)
            pb.add_soc(tilt_const + 0.0 * v_X[k, 0], v_X[k, 8:10])
            # angular rate ||w|| <= w_max
            pb.add_soc(p.w_B_max + 0.0 * v_X[k, 0], v_X[k, 11:14])

        # final input zeroing (components 0, 1, 3)
        pb.add_eq(v_U[n_U - 1, 0])
        pb.add_eq(v_U[n_U - 1, 1])
        pb.add_eq(v_U[n_U - 1, 3])

        if p.exact_minimum_thrust:
            (n_hat,) = ref  # (n_U, 3) normalized previous thrust
            for k in range(n_U):
                pb.add_nonneg(n_hat[k] @ v_U[k, 0:3] - p.T_min)
        else:
            pb.add_nonneg(v_U[:, 2] - p.T_min)

        for k in range(n_U):
            # max thrust ||T|| <= T_max
            pb.add_soc(p.T_max + 0.0 * v_U[k, 3], v_U[k, 0:3])
            # gimbal cone ||T_xy|| <= tan(gimbal_max) * T_z
            pb.add_soc(tan_gimbal * v_U[k, 2], v_U[k, 0:2])

        if p.enable_roll_control:
            pb.add_nonneg(p.t_max - v_U[:, 3])
            pb.add_nonneg(v_U[:, 3] + p.t_max)
        else:
            pb.add_eq(v_X[:, 13])
            pb.add_eq(v_U[:, 3])

    # final-state components pinned at node K-1: all except mass (0),
    # q_w (7), q_z (10) -> free roll (rocketQuat.cpp:79-89)
    _FINAL_PIN = (1, 2, 3, 4, 5, 6, 8, 9, 11, 12, 13)

    @staticmethod
    def constraints_staged(sb, x, u, p: RocketQuatParams, ref=(), n_U=None):
        """Same constraint set as :meth:`constraints`, emitted as vectorized
        node families for the stage-banded builder (rocketQuat.cpp:70-144)."""
        K = sb.K
        n_U = K if n_U is None else n_U
        un = np.arange(n_U)
        pin = list(RocketQuat._FINAL_PIN)

        sb.eq(x.sel() - p.x_init, nodes=[0])
        sb.eq(x.sel(pin) - p.x_final[jnp.asarray(pin)], nodes=[K - 1])

        # mass above dry mass
        sb.nonneg(x.sel(0) - p.x_final[0])

        # glideslope ||r_xy|| <= tan(gamma_gs) * r_z
        sb.soc(x.sel(3) * jnp.tan(p.gamma_gs), x.sel([1, 2]))
        # tilt ||q_xy|| <= sqrt((1-cos(theta_max))/2)
        sb.soc(jnp.sqrt((1.0 - jnp.cos(p.theta_max)) / 2.0), x.sel([8, 9]))
        # angular rate ||w|| <= w_max
        sb.soc(p.w_B_max, x.sel([11, 12, 13]))

        # final input zeroing (components 0, 1, 3)
        sb.eq(u.sel([0, 1, 3]), nodes=[n_U - 1])

        if p.exact_minimum_thrust:
            (n_hat,) = ref  # (n_U, 3) normalized previous thrust
            sb.nonneg(u.lin(n_hat[:, None, :], idx=[0, 1, 2]) - p.T_min,
                      nodes=un)
        else:
            sb.nonneg(u.sel(2) - p.T_min, nodes=un)

        # max thrust ||T|| <= T_max; gimbal cone ||T_xy|| <= tan(d_max) T_z
        sb.soc(p.T_max, u.sel([0, 1, 2]), nodes=un)
        sb.soc(u.sel(2) * jnp.tan(p.gimbal_max), u.sel([0, 1]), nodes=un)

        if p.enable_roll_control:
            sb.nonneg(-u.sel(3) + p.t_max, nodes=un)
            sb.nonneg(u.sel(3) + p.t_max, nodes=un)
        else:
            sb.eq(x.sel(13))
            sb.eq(u.sel(3), nodes=un)

    @staticmethod
    def clamp_input(p: RocketQuatParams, u):
        """Clamp a controller output into the thrust cone
        (LQR_sim.cpp:55-66): T_z >= T_min, gimbal cone, ||T|| <= T_max."""
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
    def disperse_x_init(p: RocketQuatParams, key, scale):
        """Sample a *feasible* dispersed initial state (batched analog of
        randomizeInitialState, rocketQuat.cpp:203-227): Gaussian dispersion
        on horizontal position and velocity, attitude rebuilt from perturbed
        Euler angles (stays a unit quaternion), everything kept inside the
        glideslope cone, tilt and rate SOCs so the pinned initial node
        remains feasible (rocketQuat.cpp:79-105)."""
        kr, kv, ka, kw = jax.random.split(key, 4)
        dtype = p.x_init.dtype
        s = jnp.asarray(scale, dtype)
        r_xy = p.x_init[1:3] + s * jax.random.normal(kr, (2,), dtype)
        lim = 0.95 * jnp.tan(p.gamma_gs) * p.x_init[3]
        nrm = jnp.linalg.norm(r_xy)
        r_xy = r_xy * jnp.minimum(1.0, lim / jnp.maximum(nrm, 1e-30))
        v = p.x_init[4:7] + 0.2 * s * jax.random.normal(kv, (3,), dtype)
        frac = jnp.minimum(s / 10.0, 1.0)
        rpy0 = quat_to_euler_xyz(p.x_init[7:11])
        d_rp = frac * 0.3 * p.theta_max * \
            jax.random.uniform(ka, (2,), dtype, -1.0, 1.0)
        rp = jnp.clip(rpy0[:2] + d_rp,
                      -0.45 * p.theta_max, 0.45 * p.theta_max)
        q = euler_xyz_to_quat(jnp.concatenate([rp, rpy0[2:3]]))
        w = p.x_init[11:14] + frac * 0.3 * p.w_B_max * \
            jax.random.uniform(kw, (3,), dtype, -1.0, 1.0)
        if not p.enable_roll_control:
            # roll disabled pins w_z = 0 at EVERY node including the pinned
            # initial one (constraints: v_X[:, 13] == 0 alongside the x_init
            # pin, rocketQuat.cpp:135-143) — a dispersed w_z would make the
            # subproblem's equality system infeasible
            w = w.at[2].set(0.0)
        wn = jnp.linalg.norm(w)
        w = w * jnp.minimum(1.0, 0.9 * p.w_B_max / jnp.maximum(wn, 1e-30))
        return jnp.concatenate([p.x_init[0:1], r_xy, p.x_init[3:4], v, q, w])

    # ---- nondimensionalization (rocketQuat.cpp:291-332) ----

    @staticmethod
    def nondimensionalize(p: RocketQuatParams) -> RocketQuatParams:
        m_scale = p.x_init[0]
        r_scale = jnp.linalg.norm(p.x_init[1:4])
        x_div = RocketQuat._state_scale(m_scale, r_scale, p.x_init.dtype)
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
    def redimensionalize(p: RocketQuatParams) -> RocketQuatParams:
        m_scale, r_scale = p.m_scale, p.r_scale
        x_mul = RocketQuat._state_scale(m_scale, r_scale, p.x_init.dtype)
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
    def _state_scale(m_scale, r_scale, dtype):
        """Per-state scale vector: mass by m_scale, r and v by r_scale."""
        return jnp.concatenate([
            m_scale[None].astype(dtype) if m_scale.ndim == 0 else m_scale,
            jnp.full((6,), r_scale, dtype),
            jnp.ones((7,), dtype),
        ])

    @staticmethod
    def scale_trajectory(p: RocketQuatParams, td: TrajectoryData) -> TrajectoryData:
        """(rocketQuat.cpp:175-187)"""
        x_div = RocketQuat._state_scale(p.m_scale, p.r_scale, td.X.dtype)
        u_div = jnp.concatenate([
            jnp.full((3,), p.m_scale * p.r_scale, td.U.dtype),
            (p.m_scale * p.r_scale**2)[None]])
        return td.replace(X=td.X / x_div, U=td.U / u_div)

    @staticmethod
    def unscale_trajectory(p: RocketQuatParams, td: TrajectoryData) -> TrajectoryData:
        """(rocketQuat.cpp:189-201)"""
        x_mul = RocketQuat._state_scale(p.m_scale, p.r_scale, td.X.dtype)
        u_mul = jnp.concatenate([
            jnp.full((3,), p.m_scale * p.r_scale, td.U.dtype),
            (p.m_scale * p.r_scale**2)[None]])
        return td.replace(X=td.X * x_mul, U=td.U * u_mul)
