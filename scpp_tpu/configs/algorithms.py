"""Algorithm configurations.

Primary configuration is plain Python dataclasses (static structure for
jit); every config can also be loaded from a reference-format ``.info``
file for drop-in compatibility (SC.info / SCvx.info / MPC.info / LQR.info,
see SCAlgorithm.cpp:22-46, SCvxAlgorithm.cpp:23-43, MPCAlgorithm.cpp:17-32,
LQRAlgorithm.cpp:65-75). Defaults below are the stock Rocket2D values;
per-model presets mirror the reference config tree.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import numpy as np

from scpp_tpu.solver.ipm import IPMSettings
from scpp_tpu.solver.scs import SolverSettings  # noqa: F401 (alt backend)
from scpp_tpu.utils.info_parser import InfoFile

__all__ = ["SCConfig", "SCvxConfig", "MPCConfig", "LQRConfig"]


@dataclass(frozen=True)
class SCvxConfig:
    """Hard-trust-region SCvx (Mao/Acikmese ratio test), SCvx.info."""

    K: int = 30
    max_iterations: int = 20
    solve_budget: int = 30          # total subproblem solves incl. rejects
    rho_0: float = 0.0
    rho_1: float = 0.25
    rho_2: float = 0.9
    alpha: float = 2.0
    beta: float = 3.2
    change_threshold: float = 1e-2
    weight_virtual_control: float = 1e3
    trust_region: float = 5.0
    # Optional per-node state trust region ||x - x0|| <= r_x, scaled by the
    # same accept/reject ladder as the input radius. 0 disables it — exact
    # parity with the reference, which trust-regions only the input
    # (SCvxProblem.cpp:58-68). The default IS the reference formulation:
    # with a near-optimal subproblem solver it converges on all models
    # including flagship RocketQuat K=30 (quantified in PARITY.md — the
    # round-2 belief that a state bound was required traced to the IPM's
    # broken relative-gap test accepting feasible-but-suboptimal iterates,
    # whose inflated ||nu||_1 corrupted the ratio test). A nonzero bound
    # remains useful as an accelerator: it shortens the flagship solve
    # from ~24 to ~17 subproblem solves by keeping X near the
    # linearization point where A,B,z are accurate.
    state_trust_region: float = 0.0
    nondimensionalize: bool = False
    interpolate_input: bool = True
    substeps: int = 10
    sim_substeps: int = 12
    integrator: str = "dopri5"
    l1_split: bool = True   # nu = nu+ - nu- encoding (see build_scvx_subproblem)
    # "staged": block-tridiagonal KKT IPM on the stage-banded emission
    # (O(K w^3), the TPU speed path); "dense": flat emission + dense-KKT
    # IPM (oracle path; required for l1_split=False)
    backend: str = "staged"
    # run discretization + resimulation through the fused Pallas RK
    # kernels (ops/disc_mono.py): identical math to the unfused path in
    # one dispatch each — the unfused RK chains are ~60 ms of per-op
    # dispatch overhead per SCvx step at batch 64 (PERF.md §2).
    fuse_dynamics: bool = False
    # carry the IPM primal/dual state across subproblem solves (staged
    # backend only): consecutive SCvx iterations solve nearly identical
    # SOCPs, so the previous optimum is a strong initial point. No
    # reference analog (ECOS cold-starts every solve, SCAlgorithm.cpp:78).
    warm_start: bool = True
    solver: object = IPMSettings(iters=30)

    @staticmethod
    def from_info(path: str, **overrides) -> "SCvxConfig":
        f = InfoFile(path)
        cfg = SCvxConfig(
            K=f.load_scalar("K", int),
            max_iterations=f.load_scalar("max_iterations", int),
            solve_budget=int(1.5 * f.load_scalar("max_iterations", int)),
            rho_0=f.load_scalar("rho_0"),
            rho_1=f.load_scalar("rho_1"),
            rho_2=f.load_scalar("rho_2"),
            alpha=f.load_scalar("alpha"),
            beta=f.load_scalar("beta"),
            change_threshold=f.load_scalar("change_threshold"),
            weight_virtual_control=f.load_scalar("weight_virtual_control"),
            trust_region=f.load_scalar("trust_region"),
            nondimensionalize=f.load_scalar("nondimensionalize", bool),
            interpolate_input=f.load_scalar("interpolate_input", bool),
        )
        return replace(cfg, **overrides)


@dataclass(frozen=True)
class SCConfig:
    """Soft-trust-region free-final-time SC (Szmuk/Acikmese), SC.info."""

    K: int = 25
    max_iterations: int = 15
    free_final_time: bool = True
    interpolate_input: bool = True
    nondimensionalize: bool = True
    delta_tol: float = 1e-3
    nu_tol: float = 1e-5
    weight_time: float = 1.0
    weight_trust_region_time: float = 1.0
    weight_trust_region_trajectory: float = 1.0
    weight_virtual_control: float = 1000.0
    substeps: int = 10
    sim_substeps: int = 12
    integrator: str = "dopri5"
    l1_split: bool = True   # nu = nu+ - nu- encoding (see build_sc_subproblem)
    backend: str = "staged"  # see SCvxConfig.backend
    warm_start: bool = True  # see SCvxConfig.warm_start
    solver: object = IPMSettings(iters=30)

    @staticmethod
    def from_info(path: str, **overrides) -> "SCConfig":
        f = InfoFile(path)
        free_final_time = f.load_scalar("free_final_time", bool)
        cfg = SCConfig(
            K=f.load_scalar("K", int),
            max_iterations=f.load_scalar("max_iterations", int),
            free_final_time=free_final_time,
            interpolate_input=f.load_scalar("interpolate_input", bool),
            nondimensionalize=f.load_scalar("nondimensionalize", bool),
            delta_tol=f.load_scalar("delta_tol"),
            nu_tol=f.load_scalar("nu_tol"),
            weight_time=f.load_scalar("weight_time"),
            weight_trust_region_time=(
                f.load_scalar("weight_trust_region_time")
                if free_final_time else 0.0),
            weight_trust_region_trajectory=f.load_scalar(
                "weight_trust_region_trajectory"),
            weight_virtual_control=f.load_scalar("weight_virtual_control"),
        )
        return replace(cfg, **overrides)


@dataclass(frozen=True)
class MPCConfig:
    """Linear receding-horizon SOCP MPC, MPC.info.

    ``solver``: the PRODUCTION backend is the dense IPM (default). A
    first-order HSD backend (scs.SolverSettings) is also accepted but is
    demoted to experimental/oracle status: measured at stock MPC shapes
    in fp32, warm re-solves stall at ~5e-4 residuals (above the 1e-4
    solved threshold) and degrade with more iterations — a structural
    fp32 first-order accuracy floor, not a tuning issue. See
    solver/scs.py STATUS note and BENCH mpc_resolve lines.
    """

    K: int = 7
    time_horizon: float = 1.5
    nondimensionalize: bool = False
    # parsed for MPC.info compatibility, intentionally unused: the
    # reference flag selects baked cvx::par vs pointer-backed cvx::dynpar
    # dynamics (MPCProblem.cpp:33-55) — a rebuild-avoidance knob. Under
    # jit the dynamics matrices are always traced arguments (re-solves
    # never rebuild), so both reference modes behave identically here.
    constant_dynamics: bool = True
    intermediate_cost_active: bool = False
    state_weights_intermediate: tuple = (1.0, 1.0, 1.0, 1.0, 1.0, 1.0)
    state_weights_terminal: tuple = (5.0, 5.0, 5.0, 1.0, 1.0, 1.0)
    input_weights: tuple = (0.1, 0.1)
    solver: object = IPMSettings(iters=20)

    @staticmethod
    def from_info(path: str, state_dim: int, input_dim: int, **overrides) -> "MPCConfig":
        f = InfoFile(path)
        cfg = MPCConfig(
            K=f.load_scalar("K", int),
            time_horizon=f.load_scalar("time_horizon"),
            nondimensionalize=f.load_scalar("nondimensionalize", bool),
            constant_dynamics=f.load_scalar("constant_dynamics", bool),
            intermediate_cost_active=f.load_scalar("intermediate_cost_active", bool),
            state_weights_intermediate=tuple(
                f.load_vector("state_weights_intermediate", state_dim)),
            state_weights_terminal=tuple(
                f.load_vector("state_weights_terminal", state_dim)),
            input_weights=tuple(f.load_vector("input_weights", input_dim)),
        )
        return replace(cfg, **overrides)


@dataclass(frozen=True)
class LQRConfig:
    """Infinite-horizon LQR weights, LQR.info."""

    state_weights: tuple = (1.0, 1.0, 1.0, 1.0, 1.0, 1.0)
    input_weights: tuple = (2.0, 2.0)

    @staticmethod
    def from_info(path: str, state_dim: int, input_dim: int, **overrides) -> "LQRConfig":
        f = InfoFile(path)
        cfg = LQRConfig(
            state_weights=tuple(f.load_vector("state_weights", state_dim)),
            input_weights=tuple(f.load_vector("input_weights", input_dim)),
        )
        return replace(cfg, **overrides)


# stock per-model presets (reference scpp_models/config/<Model>/*.info)
ROCKET2D_SC = SCConfig()
ROCKET2D_SCVX = SCvxConfig()
ROCKET2D_MPC = MPCConfig()
ROCKET2D_LQR = LQRConfig()
ROCKETQUAT_SC = SCConfig(K=15, weight_trust_region_trajectory=50.0)
ROCKETQUAT_SCVX = SCvxConfig(change_threshold=1e-3, nondimensionalize=True,
                             max_iterations=30, solve_budget=45)
ROCKETQUAT_LQR = LQRConfig(state_weights=(1.0,) * 14,
                           input_weights=(5.0, 5.0, 1.0, 5.0))
