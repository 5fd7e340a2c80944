"""Planar rocket landing model.

Behavioral parity with the reference Rocket2D
(scpp_models/src/rocket2d.cpp:7-232, include/rocket2d.hpp:18-85):
state (r(2), v(2), eta, omega), input (gimbal angle, thrust magnitude),
dynamic params (m, J_B, g_I(2), r_T_B(2)).

Default physical values correspond to the stock Rocket2D configuration
(scpp_models/config/Rocket2D/model.info).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from scpp_tpu.models.mathlib import deg2rad, rot2d
from scpp_tpu.trajectory import TrajectoryData

__all__ = ["Rocket2D", "Rocket2DParams"]


@struct.dataclass
class Rocket2DParams:
    # physical
    m: jnp.ndarray
    J_B: jnp.ndarray
    g_I: jnp.ndarray      # (2,)
    r_T_B: jnp.ndarray    # (2,)
    T_min: jnp.ndarray
    T_max: jnp.ndarray
    # constraint bounds (radians)
    gamma_gs: jnp.ndarray
    gimbal_max: jnp.ndarray
    theta_max: jnp.ndarray
    w_B_max: jnp.ndarray
    # boundary conditions
    x_init: jnp.ndarray   # (6,)
    x_final: jnp.ndarray  # (6,)
    final_time: jnp.ndarray
    # nondimensionalization scales (identity when dimensional)
    m_scale: jnp.ndarray = struct.field(default_factory=lambda: jnp.ones(()))
    r_scale: jnp.ndarray = struct.field(default_factory=lambda: jnp.ones(()))
    # structure flags (static: change the constraint set)
    constrain_initial_final: bool = struct.field(pytree_node=False, default=True)


class Rocket2D:
    """Namespace of pure functions defining the planar rocket."""

    name = "Rocket2D"
    state_dim = 6   # x, y, vx, vy, eta, omega
    input_dim = 2   # gimbal angle, thrust magnitude
    param_dim = 6   # m, J_B, g_I(2), r_T_B(2)
    Params = Rocket2DParams

    @staticmethod
    def default_params(dtype=None) -> Rocket2DParams:
        """Stock Rocket2D configuration (config/Rocket2D/model.info)."""
        f = (lambda v: jnp.asarray(v, dtype=dtype))
        return Rocket2DParams(
            m=f(24000.0),
            J_B=f(5_000_000.0),
            g_I=f([0.0, -9.81]),
            r_T_B=f([0.0, -15.0]),
            T_min=f(10_000.0),
            T_max=f(420_000.0),
            gamma_gs=deg2rad(f(45.0)),
            gimbal_max=deg2rad(f(15.0)),
            theta_max=deg2rad(f(60.0)),
            w_B_max=deg2rad(f(20.0)),
            x_init=jnp.concatenate([
                f([-200.0, 800.0]), f([0.0, -100.0]),
                deg2rad(f([-20.0])), deg2rad(f([0.0]))]),
            x_final=jnp.concatenate([
                f([0.0, 0.0]), f([0.0, -1.0]), f([0.0]), f([0.0])]),
            final_time=f(12.0),
        )

    @staticmethod
    def from_info(path: str, dtype=None, **overrides) -> Rocket2DParams:
        """Load physics + boundary conditions from a reference-format
        ``model.info`` (rocket2d.cpp:150-195). Angles are degrees in the
        file; ``add_slack_variables`` is accepted and ignored (the
        reference parses it but no constraint in the snapshot uses it)."""
        from scpp_tpu.utils.info_parser import InfoFile
        f = InfoFile(path)
        g = (lambda v: jnp.asarray(v, dtype=dtype))
        eta_init = deg2rad(g(f.load_scalar("eta_init")))
        eta_final = deg2rad(g(f.load_scalar("eta_final")))
        w_init = deg2rad(g(f.load_scalar("w_init")))
        w_final = deg2rad(g(f.load_scalar("w_final")))
        p = Rocket2DParams(
            m=g(f.load_scalar("m")),
            J_B=g(f.load_scalar("J_B")),
            g_I=g(f.load_vector("g_I", 2)),
            r_T_B=g(f.load_vector("r_T_B", 2)),
            T_min=g(f.load_scalar("T_min")),
            T_max=g(f.load_scalar("T_max")),
            gamma_gs=deg2rad(g(f.load_scalar("gamma_gs"))),
            gimbal_max=deg2rad(g(f.load_scalar("gimbal_max"))),
            theta_max=deg2rad(g(f.load_scalar("theta_max"))),
            w_B_max=deg2rad(g(f.load_scalar("w_B_max"))),
            x_init=jnp.concatenate([
                g(f.load_vector("r_init", 2)), g(f.load_vector("v_init", 2)),
                eta_init[None], w_init[None]]),
            x_final=jnp.concatenate([
                g(f.load_vector("r_final", 2)), g(f.load_vector("v_final", 2)),
                eta_final[None], w_final[None]]),
            final_time=g(f.load_scalar("final_time")),
            constrain_initial_final=f.load_scalar("constrain_initial_final",
                                                  bool),
        )
        return p.replace(**overrides) if overrides else p

    @staticmethod
    def param_vector(p: Rocket2DParams) -> jnp.ndarray:
        """Dynamic parameter vector fed to flow_map (rocket2d.cpp:143-148)."""
        return jnp.concatenate([
            p.m[None], p.J_B[None], p.g_I, p.r_T_B])

    @staticmethod
    def flow_map(x, u, par):
        """xdot = f(x, u) (rocket2d.cpp:7-38)."""
        m, J_B = par[0], par[1]
        g_I = par[2:4]
        r_T_B = par[4:6]

        v = x[2:4]
        eta = x[4]
        w = x[5]

        angle, magnitude = u[0], u[1]
        # thrust vector in body frame: Rot(angle) @ [0, magnitude]
        T_B = rot2d(angle) @ jnp.stack([jnp.zeros_like(magnitude), magnitude])
        R_I_B = rot2d(eta)

        acc = (R_I_B @ T_B) / m + g_I
        wdot = (r_T_B[0] * T_B[1] - r_T_B[1] * T_B[0]) / J_B
        return jnp.concatenate([v, acc, w[None], wdot[None]])

    @staticmethod
    def operating_point(p: Rocket2DParams):
        """Hover equilibrium for MPC/LQR (rocket2d.cpp:40-44)."""
        x_eq = jnp.zeros(6, dtype=p.x_init.dtype)
        u_eq = jnp.stack([jnp.zeros_like(p.m), -p.g_I[1] * p.m])
        return x_eq, u_eq

    @staticmethod
    def init_trajectory(p: Rocket2DParams, K: int, interpolate_input: bool) -> TrajectoryData:
        """Straight-line interpolation, mid-thrust (rocket2d.cpp:120-136)."""
        k = jnp.arange(K, dtype=p.x_init.dtype)
        a1 = (K - k) / K
        a2 = k / K
        X = a1[:, None] * p.x_init[None, :] + a2[:, None] * p.x_final[None, :]
        n_U = K if interpolate_input else K - 1
        u_hold = jnp.stack([jnp.zeros_like(p.T_max), (p.T_max + p.T_min) / 2])
        U = jnp.tile(u_hold[None, :], (n_U, 1))
        return TrajectoryData(X=X, U=U, t=p.final_time)

    # ---- application constraints (rocket2d.cpp:46-84) ----

    @staticmethod
    def constraint_ref(p: Rocket2DParams, td: TrajectoryData):
        """No linearized constraints -> empty ref pytree."""
        return ()

    @staticmethod
    def constraints(pb, v_X, v_U, p: Rocket2DParams, ref=()):
        """Add model convex constraints to a conic problem builder.

        ``v_X`` has shape (K, 6), ``v_U`` (n_U, 2) in node-major layout.
        """
        K = v_X.shape[0]
        n_U = v_U.shape[0]

        if p.constrain_initial_final:
            pb.add_eq(v_X[0] - p.x_init)
            pb.add_eq(v_X[K - 1] - p.x_final)
            pb.add_eq(v_U[n_U - 1, 0])  # zero final gimbal

        tan_gs = jnp.tan(p.gamma_gs)
        for k in range(K):
            # glideslope |x| <= tan(gamma_gs) * y as a dim-2 SOC
            pb.add_soc(tan_gs * v_X[k, 1], v_X[k, 0])
        # tilt box
        pb.add_nonneg(p.theta_max - v_X[:, 4])
        pb.add_nonneg(v_X[:, 4] + p.theta_max)
        # angular velocity box
        pb.add_nonneg(p.w_B_max - v_X[:, 5])
        pb.add_nonneg(v_X[:, 5] + p.w_B_max)
        # gimbal box
        pb.add_nonneg(p.gimbal_max - v_U[:, 0])
        pb.add_nonneg(v_U[:, 0] + p.gimbal_max)
        # thrust box
        pb.add_nonneg(v_U[:, 1] - p.T_min)
        pb.add_nonneg(p.T_max - v_U[:, 1])

    @staticmethod
    def constraints_staged(sb, x, u, p: Rocket2DParams, ref=(), n_U=None):
        """Same constraint set as :meth:`constraints`, emitted as vectorized
        node families for the stage-banded builder (rocket2d.cpp:46-84)."""
        K = sb.K
        n_U = K if n_U is None else n_U
        un = np.arange(n_U)

        if p.constrain_initial_final:
            sb.eq(x.sel() - p.x_init, nodes=[0])
            sb.eq(x.sel() - p.x_final, nodes=[K - 1])
            sb.eq(u.sel(0), nodes=[n_U - 1])  # zero final gimbal

        # glideslope |x| <= tan(gamma_gs) * y at every node
        sb.soc(x.sel(1) * jnp.tan(p.gamma_gs), x.sel(0))
        # tilt box
        sb.nonneg(-x.sel(4) + p.theta_max)
        sb.nonneg(x.sel(4) + p.theta_max)
        # angular velocity box
        sb.nonneg(-x.sel(5) + p.w_B_max)
        sb.nonneg(x.sel(5) + p.w_B_max)
        # gimbal box
        sb.nonneg(-u.sel(0) + p.gimbal_max, nodes=un)
        sb.nonneg(u.sel(0) + p.gimbal_max, nodes=un)
        # thrust box
        sb.nonneg(u.sel(1) - p.T_min, nodes=un)
        sb.nonneg(-u.sel(1) + p.T_max, nodes=un)

    @staticmethod
    def clamp_input(p: Rocket2DParams, u):
        """Project an unconstrained controller output into the physical
        input set (the LQR_sim.cpp:55-66 pattern for the planar model)."""
        return jnp.stack([
            jnp.clip(u[0], -p.gimbal_max, p.gimbal_max),
            jnp.clip(u[1], p.T_min, p.T_max),
        ])

    @staticmethod
    def disperse_x_init(p: Rocket2DParams, key, scale):
        """Sample a *feasible* dispersed initial state (the batched analog
        of the reference's commented-out randomizeInitialState,
        rocketQuat.cpp:203-227). Position/velocity get Gaussian dispersion
        of magnitude ``scale``; attitude and rate are drawn uniformly well
        inside their hard boxes and the glideslope cone so the pinned
        initial node never makes the subproblem infeasible
        (rocket2d.cpp:63-76)."""
        kr, kv, ka, kw = jax.random.split(key, 4)
        dtype = p.x_init.dtype
        s = jnp.asarray(scale, dtype)
        r = p.x_init[0:2] + s * jax.random.normal(kr, (2,), dtype)
        v = p.x_init[2:4] + 0.2 * s * jax.random.normal(kv, (2,), dtype)
        frac = jnp.minimum(s / 10.0, 1.0)
        eta = p.x_init[4] + frac * 0.3 * p.theta_max * \
            jax.random.uniform(ka, (), dtype, -1.0, 1.0)
        eta = jnp.clip(eta, -0.9 * p.theta_max, 0.9 * p.theta_max)
        w = p.x_init[5] + frac * 0.3 * p.w_B_max * \
            jax.random.uniform(kw, (), dtype, -1.0, 1.0)
        w = jnp.clip(w, -0.9 * p.w_B_max, 0.9 * p.w_B_max)
        lim = 0.95 * jnp.tan(p.gamma_gs) * r[1]
        rx = jnp.clip(r[0], -lim, lim)
        return jnp.concatenate([rx[None], r[1:2], v, eta[None], w[None]])

    # ---- nondimensionalization (rocket2d.cpp:197-232) ----

    @staticmethod
    def nondimensionalize(p: Rocket2DParams) -> Rocket2DParams:
        r_scale = jnp.linalg.norm(p.x_init[:2])
        m_scale = p.m
        scale4 = jnp.concatenate([jnp.full((4,), r_scale, p.x_init.dtype),
                                  jnp.ones((2,), p.x_init.dtype)])
        return p.replace(
            m=p.m / m_scale,
            r_T_B=p.r_T_B / r_scale,
            g_I=p.g_I / r_scale,
            J_B=p.J_B / (m_scale * r_scale**2),
            x_init=p.x_init / scale4,
            x_final=p.x_final / scale4,
            T_min=p.T_min / (m_scale * r_scale),
            T_max=p.T_max / (m_scale * r_scale),
            m_scale=m_scale,
            r_scale=r_scale,
        )

    @staticmethod
    def redimensionalize(p: Rocket2DParams) -> Rocket2DParams:
        m_scale, r_scale = p.m_scale, p.r_scale
        scale4 = jnp.concatenate([jnp.full((4,), r_scale, p.x_init.dtype),
                                  jnp.ones((2,), p.x_init.dtype)])
        return p.replace(
            m=p.m * m_scale,
            r_T_B=p.r_T_B * r_scale,
            g_I=p.g_I * r_scale,
            J_B=p.J_B * (m_scale * r_scale**2),
            x_init=p.x_init * scale4,
            x_final=p.x_final * scale4,
            T_min=p.T_min * (m_scale * r_scale),
            T_max=p.T_max * (m_scale * r_scale),
            # scales are kept so trajectories can still be (un)scaled after
            # redimensionalizing, as in SCAlgorithm.cpp:182-186
        )

    @staticmethod
    def scale_trajectory(p: Rocket2DParams, td: TrajectoryData) -> TrajectoryData:
        """Dimensional -> nondimensional (rocket2d.cpp:96-106)."""
        x_div = jnp.concatenate([jnp.full((4,), p.r_scale, td.X.dtype),
                                 jnp.ones((2,), td.X.dtype)])
        u_div = jnp.stack([jnp.ones((), td.U.dtype), p.m_scale * p.r_scale])
        return td.replace(X=td.X / x_div, U=td.U / u_div)

    @staticmethod
    def unscale_trajectory(p: Rocket2DParams, td: TrajectoryData) -> TrajectoryData:
        """Nondimensional -> dimensional (rocket2d.cpp:108-118)."""
        x_mul = jnp.concatenate([jnp.full((4,), p.r_scale, td.X.dtype),
                                 jnp.ones((2,), td.X.dtype)])
        u_mul = jnp.stack([jnp.ones((), td.U.dtype), p.m_scale * p.r_scale])
        return td.replace(X=td.X * x_mul, U=td.U * u_mul)
