"""Closed-loop simulation drivers — the reference executables as jitted scans.

Behavioral parity with the reference mains:
  - lqr_sim:     scpp/src/LQR_sim.cpp:12-89  (10 ms loop, clamped LQR)
  - mpc_sim:     scpp/src/MPC_sim.cpp:16-91  (re-solve + apply u0; the
                 reference advances the plant by the *measured* solve time
                 with a 10 ms floor — on-device we use the fixed 10 ms
                 floor so results are deterministic and batchable)
  - sc_sim:      scpp/src/SC_sim.cpp:19-71   (full warm-started SC solve
                 per 50 ms step, apply u(0..dt))
  - sc_tracking: scpp/src/SC_tracking.cpp:17-85 (SC trajectory + LQR gain
                 schedule at 10 ms)

TPU-native redesign: each loop is a ``lax.scan`` with a frozen-when-done
mask (reached_end = ||x - x_final|| < 0.02, SC_sim.cpp:57), so whole
closed-loop runs jit once, batch under vmap over scenarios, and never
leave the chip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from scpp_tpu.algos.common import tree_select
from scpp_tpu.algos.lqr import (
    build_tracker, lqr_control, lqr_controller, tracker_input,
)
from scpp_tpu.algos.mpc import mpc_solve
from scpp_tpu.algos.sc import solve_sc
from scpp_tpu.configs.algorithms import LQRConfig, MPCConfig, SCConfig
from scpp_tpu.ops.simulation import simulate

__all__ = ["lqr_sim", "mpc_sim", "sc_sim", "sc_tracking", "SimHistory"]


@struct.dataclass
class SimHistory:
    X: jnp.ndarray          # (steps, n) state after each step
    U: jnp.ndarray          # (steps, m) applied inputs
    t: jnp.ndarray          # (steps,) time stamps
    steps: jnp.ndarray      # number of active steps before reached_end
    reached_end: jnp.ndarray


def _reached(x, x_final, tol=0.02):
    return jnp.linalg.norm(x - x_final) < tol


def _finite(*arrays):
    ok = jnp.asarray(True)
    for a in arrays:
        ok = ok & jnp.all(jnp.isfinite(a))
    return ok


@partial(jax.jit, static_argnums=(0, 2, 3, 4))
def lqr_sim(model, params, cfg: LQRConfig = LQRConfig(),
            sim_time: float = 5.0, time_step: float = 0.01) -> SimHistory:
    """Point-stabilizing LQR closed loop (LQR_sim.cpp:12-89)."""
    par = model.param_vector(params)
    K, x_eq, u_eq = lqr_controller(model, params, cfg.state_weights,
                                   cfg.input_weights)
    n_steps = int(sim_time / time_step)
    x_final = params.x_final

    def step(carry, i):
        x, done = carry
        u = lqr_control(K, u_eq, x, x_final)
        u = model.clamp_input(params, u)
        x_new = simulate(model, par, time_step, u, u, x, substeps=4)
        x_next = jnp.where(done | ~_finite(x_new), x, x_new)
        done_next = done | _reached(x_next, x_final)
        return (x_next, done_next), (x_next, u, (i + 1) * time_step,
                                     jnp.logical_not(done))

    (x, done), (Xs, Us, ts, active) = jax.lax.scan(
        step, (params.x_init, jnp.asarray(False)), jnp.arange(n_steps))
    return SimHistory(X=Xs, U=Us, t=ts, steps=jnp.sum(active),
                      reached_end=done)


@partial(jax.jit, static_argnums=(0, 2, 3, 4))
def mpc_sim(model, params, cfg: MPCConfig = MPCConfig(),
            sim_time: float = 15.0, time_step: float = 0.01) -> SimHistory:
    """Receding-horizon MPC closed loop (MPC_sim.cpp:16-91).

    With a first-order solver config (SolverSettings, warm_start=True)
    each re-solve warm-starts from the previous step's scaled iterates —
    the parameterized re-solve pattern of MPCAlgorithm.cpp:93-116."""
    from scpp_tpu.solver.scs import SolverSettings as _ScsSettings

    par = model.param_vector(params)
    n_steps = int(sim_time / time_step)
    x_final = params.x_final
    use_warm = (isinstance(cfg.solver, _ScsSettings)
                and cfg.solver.warm_start)

    def step(carry, i):
        x, u_prev, warm, done = carry
        # plant moves while the controller "solves" (MPC_sim.cpp:67)
        x_mid = simulate(model, par, time_step, u_prev, u_prev, x, substeps=4)
        _, U, res = mpc_solve(model, params, x, cfg, x_final, warm)
        u = U[0]
        # per-step failure masking (SURVEY §5): one bad conic solve must
        # not poison the rollout — keep the previous input / freeze the
        # state instead of the reference's std::terminate
        u = jnp.where(_finite(u), u, u_prev)
        x_next = jnp.where(done | ~_finite(x_mid), x, x_mid)
        u_next = jnp.where(done, u_prev, u)
        done_next = done | _reached(x_next, x_final)
        # gate the warm carry on solve health: carrying a diverged
        # SolverResult would feed NaN iterates into every subsequent
        # warm-started solve, permanently disabling the controller
        if use_warm:
            solve_ok = _finite(U) & res.solved
            warm_next = tree_select(solve_ok, res, warm)
        else:
            warm_next = None
        return (x_next, u_next, warm_next, done_next), (
            x_next, u_next, (i + 1) * time_step, jnp.logical_not(done))

    u0 = jnp.zeros(model.input_dim, params.x_init.dtype)
    # cold solve establishes the warm-start carry structure
    warm0 = (mpc_solve(model, params, params.x_init, cfg, x_final)[2]
             if use_warm else None)
    (x, _, _, done), (Xs, Us, ts, active) = jax.lax.scan(
        step, (params.x_init, u0, warm0, jnp.asarray(False)),
        jnp.arange(n_steps))
    return SimHistory(X=Xs, U=Us, t=ts, steps=jnp.sum(active),
                      reached_end=done)


@partial(jax.jit, static_argnums=(0, 2, 3, 4))
def sc_sim(model, params, cfg: SCConfig = SCConfig(),
           max_steps: int = 100, time_step: float = 0.05) -> SimHistory:
    """SC-as-MPC: a full warm-started SC re-solve per step
    (SC_sim.cpp:19-71). The plant state feeds back through params.x_init,
    mirroring the reference's aliasing of x into model->p.x_init
    (SC_sim.cpp:36)."""
    x_final = params.x_final

    def step(carry, i):
        x, td_warm, done = carry
        p_i = params.replace(x_init=x)
        par_i = model.param_vector(p_i)
        res = solve_sc(model, p_i, cfg, warm_td=td_warm)
        td = res.td
        u0 = td.U[0]
        u1 = td.input_at_time(jnp.asarray(time_step, x.dtype))
        x_new = simulate(model, par_i, time_step, u0, u1, x, substeps=8)
        solve_ok = _finite(td.X, td.U, x_new)
        x_next = jnp.where(done | ~solve_ok, x, x_new)
        # stop at ||x - x_final|| < 0.02 or td.t < 0.25 (SC_sim.cpp:57)
        done_next = done | _reached(x_next, x_final) | \
            (solve_ok & (td.t < 0.25))
        td_next = tree_select(done | ~solve_ok, td_warm, td)
        return (x_next, td_next, done_next), (
            x_next, u0, (i + 1) * time_step, jnp.logical_not(done))

    # first solve outside the scan establishes the warm-start carry
    res0 = solve_sc(model, params, cfg)
    td0 = res0.td
    u0 = td0.U[0]
    u1 = td0.input_at_time(jnp.asarray(time_step, params.x_init.dtype))
    par0 = model.param_vector(params)
    x1 = simulate(model, par0, time_step, u0, u1, params.x_init, substeps=8)
    done0 = _reached(x1, x_final) | (td0.t < 0.25)

    (x, _, done), (Xs, Us, ts, active) = jax.lax.scan(
        step, (x1, td0, done0), jnp.arange(1, max_steps))
    Xs = jnp.concatenate([x1[None], Xs])
    Us = jnp.concatenate([u0[None], Us])
    ts = jnp.concatenate([jnp.asarray([time_step], ts.dtype), ts + time_step])
    return SimHistory(X=Xs, U=Us, t=ts, steps=jnp.sum(active) + 1,
                      reached_end=done)


@partial(jax.jit, static_argnums=(0, 2, 3, 4, 5))
def sc_tracking(model, params, sc_cfg: SCConfig = SCConfig(),
                lqr_cfg: LQRConfig = LQRConfig(),
                time_step: float = 0.01, n_steps: int = 2000):
    """SC solve -> LQR gain schedule -> closed-loop track
    (SC_tracking.cpp:17-85). Returns (SimHistory, sc_result).

    ``n_steps`` bounds the rollout statically; the loop freezes once
    t >= td.t like the reference's while (t < t_max)."""
    par = model.param_vector(params)
    res = solve_sc(model, params, sc_cfg)
    td = res.td
    tr = build_tracker(model, params, td, lqr_cfg.state_weights,
                       lqr_cfg.input_weights)

    def step(carry, i):
        x, done = carry
        t = i * time_step
        u = tracker_input(tr, t, x)
        u = model.clamp_input(params, u)
        x_new = simulate(model, par, time_step, u, u, x, substeps=2)
        past_end = t >= td.t
        x_next = jnp.where(done, x, x_new)
        return (x_next, done | past_end), (x_next, u, t + time_step,
                                           jnp.logical_not(done))

    (x, done), (Xs, Us, ts, active) = jax.lax.scan(
        step, (params.x_init, jnp.asarray(False)), jnp.arange(n_steps))
    hist = SimHistory(X=Xs, U=Us, t=ts, steps=jnp.sum(active),
                      reached_end=done)
    return hist, res
