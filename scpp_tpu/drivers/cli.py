"""Command-line entry points — the reference executables re-imagined.

  python -m scpp_tpu.drivers.sc_oneshot  [--model Rocket2D] [--output-dir output]
  python -m scpp_tpu.drivers.sc_sim      ...
  python -m scpp_tpu.drivers.mpc_sim     ...
  python -m scpp_tpu.drivers.lqr_sim     ...
  python -m scpp_tpu.drivers.sc_tracking ...

Each reproduces its reference counterpart's behavior and output layout
(output/<Model>/<Algo>/<timestamp>/<iter>/{X,U,t}.txt; SC_oneshot writes
every SC iteration, SC_oneshot.cpp:29-64). Config files in the reference
INFO format can be supplied with --config-dir to override the built-in
stock presets.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from scpp_tpu.configs.algorithms import LQRConfig, MPCConfig, SCConfig
from scpp_tpu.models import MODEL_REGISTRY
from scpp_tpu.utils.output_io import (
    get_time_string, write_sim_history, write_trajectory,
)
from scpp_tpu.utils.timing import PhaseTimer, tic, toc

__all__ = ["run_sc_oneshot", "run_sc_sim", "run_mpc_sim", "run_lqr_sim",
           "run_sc_tracking", "common_parser"]


def common_parser(algo: str) -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=f"{algo} driver")
    ap.add_argument("--model", default="Rocket2D",
                    choices=sorted(MODEL_REGISTRY))
    ap.add_argument("--output-dir", default="output")
    ap.add_argument("--config-dir", default=None,
                    help="directory with reference-format .info files")
    ap.add_argument("--platform", default=None,
                    help="jax platform override (e.g. cpu, tpu)")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of the solve into "
                         "DIR (view with TensorBoard / Perfetto)")
    ap.add_argument("--phase-timings", action="store_true",
                    help="print a per-phase device-time breakdown "
                         "(discretization / solve / defects — the "
                         "reference's per-iteration taxonomy, "
                         "SCAlgorithm.cpp:69-92)")
    return ap


class _maybe_profile:
    """jax.profiler.trace(dir) context when --profile was given."""

    def __init__(self, args):
        self.dir = getattr(args, "profile", None)

    def __enter__(self):
        if self.dir:
            import jax
            jax.profiler.start_trace(self.dir)
        return self

    def __exit__(self, *exc):
        if self.dir:
            import jax
            jax.profiler.stop_trace()
            print(f"Wrote profiler trace to {self.dir}")
        return False


def _ensure_backend(platform=None):
    """Select a usable jax backend before any computation.

    Some hosting environments register an experimental TPU plugin that can
    fail to initialize in subprocesses; a CLI run must degrade to CPU
    instead of crashing."""
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
        return
    try:
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "cpu")


def _setup(args, algo_cfg_name, cfg_cls, **cfg_kwargs):
    _ensure_backend(getattr(args, "platform", None))
    model = MODEL_REGISTRY[args.model]
    params = model.default_params()
    if args.config_dir:
        # model physics + boundary conditions (rocket2d.cpp:150-195,
        # rocketQuat.cpp:234-289): the reference's "edit model.info,
        # rerun" workflow
        model_info = os.path.join(args.config_dir, "model.info")
        if os.path.exists(model_info):
            params = model.from_info(model_info)
        path = os.path.join(args.config_dir, f"{algo_cfg_name}.info")
        if algo_cfg_name in ("MPC", "LQR"):
            cfg = cfg_cls.from_info(path, model.state_dim, model.input_dim,
                                    **cfg_kwargs)
        else:
            cfg = cfg_cls.from_info(path, **cfg_kwargs)
    else:
        cfg = cfg_cls(**cfg_kwargs)
    return model, params, cfg


def run_sc_oneshot(argv=None):
    """One SC solve; writes every iteration (SC_oneshot.cpp:15-65)."""
    from scpp_tpu.algos.sc import solve_sc

    args = common_parser("SC_oneshot").parse_args(argv)
    model, params, cfg = _setup(args, "SC", SCConfig)

    timer = tic()
    with _maybe_profile(args):
        res = solve_sc(model, params, cfg)
        res.td.X.block_until_ready()
    print(f"{'Time, total:':<50}{toc(timer):.2f}ms")
    if args.phase_timings:
        from scpp_tpu.utils.phases import phase_breakdown
        phase_breakdown(model, params, cfg, "sc")
    print(("Converged after" if res.converged else "No convergence after")
          + f" {int(res.iterations)} iterations.")

    out_root = os.path.join(args.output_dir, model.name, "SC",
                            get_time_string())
    n_iter = int(res.iterations)
    for k in range(n_iter):
        write_trajectory(os.path.join(out_root, str(k)),
                         res.all_X[k], res.all_U[k], res.all_t[k])
    write_trajectory(os.path.join(out_root, str(n_iter)),
                     res.td.X, res.td.U, res.td.t)
    print(f"Wrote {n_iter + 1} iterations to {out_root}")
    return res


def run_sc_sim(argv=None):
    """Closed-loop SC-MPC (SC_sim.cpp:19-104)."""
    from scpp_tpu.drivers.closed_loop import sc_sim

    ap = common_parser("SC_sim")
    ap.add_argument("--max-steps", type=int, default=100)
    ap.add_argument("--time-step", type=float, default=0.05)
    args = ap.parse_args(argv)
    model, params, cfg = _setup(args, "SC", SCConfig)

    timer = tic()
    hist = sc_sim(model, params, cfg, args.max_steps, args.time_step)
    hist.X.block_until_ready()
    elapsed = toc(timer)
    steps = int(hist.steps)
    print(f"{'Time, %d steps:' % steps:<50}{elapsed:.2f}ms")
    print(f"{'Average frequency:':<50}{steps / (elapsed * 1e-3):.2f}Hz")

    out = os.path.join(args.output_dir, model.name, "SC_sim",
                       get_time_string(), "0")
    write_sim_history(out, np.asarray(hist.X)[:steps],
                      np.asarray(hist.U)[:steps],
                      np.asarray(hist.t)[:steps])
    print(f"Wrote history to {out}")
    return hist


def run_mpc_sim(argv=None):
    """Closed-loop MPC (MPC_sim.cpp:16-130)."""
    from scpp_tpu.drivers.closed_loop import mpc_sim

    ap = common_parser("MPC_sim")
    ap.add_argument("--sim-time", type=float, default=15.0)
    ap.add_argument("--time-step", type=float, default=0.01)
    args = ap.parse_args(argv)
    model, params, cfg = _setup(args, "MPC", MPCConfig)
    params = params.replace(constrain_initial_final=False) \
        if hasattr(params, "constrain_initial_final") else params

    timer = tic()
    hist = mpc_sim(model, params, cfg, args.sim_time, args.time_step)
    hist.X.block_until_ready()
    elapsed = toc(timer)
    steps = int(hist.steps)
    sim_t = steps * args.time_step
    print(f"{'Runtime:':<50}{elapsed * 1e-3:.2f}s")
    print(f"{'Simulated time:':<50}{sim_t:.2f}s")
    print(f"{'Average frequency:':<50}{steps / max(sim_t, 1e-9):.2f}Hz")

    out = os.path.join(args.output_dir, model.name, "MPC",
                       get_time_string(), "0")
    write_sim_history(out, np.asarray(hist.X)[:steps],
                      np.asarray(hist.U)[:steps], np.asarray(hist.t)[:steps])
    print(f"Wrote history to {out}")
    return hist


def run_lqr_sim(argv=None):
    """Closed-loop LQR (LQR_sim.cpp:12-128)."""
    from scpp_tpu.drivers.closed_loop import lqr_sim

    ap = common_parser("LQR_sim")
    ap.add_argument("--sim-time", type=float, default=5.0)
    ap.add_argument("--time-step", type=float, default=0.01)
    args = ap.parse_args(argv)
    model, params, cfg = _setup(args, "LQR", LQRConfig)
    params = params.replace(constrain_initial_final=False) \
        if hasattr(params, "constrain_initial_final") else params

    timer = tic()
    hist = lqr_sim(model, params, cfg, args.sim_time, args.time_step)
    hist.X.block_until_ready()
    elapsed = toc(timer)
    steps = int(hist.steps)
    sim_t = steps * args.time_step
    print(f"{'Runtime:':<50}{elapsed * 1e-3:.2f}s")
    print(f"{'Simulated time:':<50}{sim_t:.2f}s")
    print(f"{'Average frequency:':<50}{steps / max(sim_t, 1e-9):.2f}Hz")

    out = os.path.join(args.output_dir, model.name, "LQR",
                       get_time_string(), "0")
    write_sim_history(out, np.asarray(hist.X)[:steps],
                      np.asarray(hist.U)[:steps], np.asarray(hist.t)[:steps])
    print(f"Wrote history to {out}")
    return hist


def run_sc_tracking(argv=None):
    """SC solve + LQR tracking (SC_tracking.cpp:17-124)."""
    from scpp_tpu.drivers.closed_loop import sc_tracking

    ap = common_parser("SC_tracking")
    ap.add_argument("--time-step", type=float, default=0.01)
    ap.add_argument("--n-steps", type=int, default=2500)
    args = ap.parse_args(argv)
    model, params, sc_cfg = _setup(args, "SC", SCConfig)
    lqr_cfg = (LQRConfig.from_info(
        os.path.join(args.config_dir, "LQR.info"),
        model.state_dim, model.input_dim) if args.config_dir else LQRConfig())

    timer = tic()
    hist, sc_res = sc_tracking(model, params, sc_cfg, lqr_cfg,
                               args.time_step, args.n_steps)
    hist.X.block_until_ready()
    steps = int(hist.steps)
    final = np.asarray(hist.X)[steps - 1]
    initial_error = float(np.linalg.norm(
        np.asarray(params.x_init - params.x_final)))
    final_error = float(np.linalg.norm(final - np.asarray(params.x_final)))
    print(f"Finished after {steps + 1} steps.")
    print(f"Final error: {100.0 * final_error / initial_error:.4f}%.")
    print(f"{'Time, simulation:':<50}{toc(timer):.2f}ms")

    out = os.path.join(args.output_dir, model.name, "SC_tracking",
                       get_time_string(), "0")
    write_sim_history(out, np.asarray(hist.X)[:steps],
                      np.asarray(hist.U)[:steps], np.asarray(hist.t)[:steps])
    print(f"Wrote history to {out}")
    return hist
