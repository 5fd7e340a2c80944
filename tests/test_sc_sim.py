"""Closed-loop SC-as-MPC driver (SC_sim.cpp analog) at small scale."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from scpp_tpu.configs.algorithms import SCConfig
from scpp_tpu.drivers.closed_loop import sc_sim
from scpp_tpu.models import Rocket2D
from scpp_tpu.solver.ipm import IPMSettings


def test_sc_sim_descends_toward_target():
    """Each 50 ms step re-solves SC warm-started from the previous
    trajectory and applies the first input (SC_sim.cpp:19-71). After a
    couple of seconds of flight the rocket is closer to the pad.

    Compile-heavy (a scan over full SC solves): kept minimal."""
    cfg = SCConfig(K=6, max_iterations=3, substeps=4, sim_substeps=4,
                   solver=IPMSettings(iters=15))
    p = Rocket2D.default_params()
    hist = sc_sim(Rocket2D, p, cfg, max_steps=20, time_step=0.05)
    steps = int(hist.steps)
    assert steps >= 5
    X = np.asarray(hist.X)
    x0 = np.asarray(p.x_init)
    xf = np.asarray(p.x_final)
    d_start = np.linalg.norm(x0[:2] - xf[:2])
    d_end = np.linalg.norm(X[steps - 1, :2] - xf[:2])
    assert d_end < d_start, f"{d_start} -> {d_end}"
    # descending with arrested velocity growth, all finite
    assert np.all(np.isfinite(X[:steps]))
    assert X[steps - 1, 1] < x0[1]
