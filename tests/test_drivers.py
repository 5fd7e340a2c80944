"""CLI drivers and golden-format output IO."""

import os

import numpy as np
import pytest

from scpp_tpu.utils.output_io import (
    read_trajectory, reduce_vector, write_sim_history, write_trajectory,
)


def test_trajectory_roundtrip(tmp_path):
    X = np.random.default_rng(0).standard_normal((10, 6))
    U = np.random.default_rng(1).standard_normal((10, 2))
    t = 12.5
    d = write_trajectory(str(tmp_path / "0"), X, U, t)
    X2, U2, t2 = read_trajectory(d)
    np.testing.assert_allclose(X2, X)
    np.testing.assert_allclose(U2, U)
    assert t2 == t


def test_sim_history_downsamples(tmp_path):
    X = np.arange(300.0).reshape(100, 3)
    U = np.arange(200.0).reshape(100, 2)
    ts = np.arange(100.0)
    d = write_sim_history(str(tmp_path / "0"), X, U, ts, write_steps=30)
    X2, U2, t2 = read_trajectory(d)
    assert X2.shape[0] <= 34
    assert X2.shape[1] == 3
    assert len(t2) == X2.shape[0]


def test_reduce_vector():
    v = list(range(100))
    r = reduce_vector(v, 30)
    assert len(r) <= 34
    assert r[0] == 0


def test_sc_oneshot_cli(tmp_path):
    """The SC_oneshot driver writes per-iteration golden files
    (SC_oneshot.cpp:15-65 behavior)."""
    from scpp_tpu.drivers.cli import run_sc_oneshot

    res = run_sc_oneshot(["--model", "Rocket2D",
                          "--output-dir", str(tmp_path)])
    assert bool(res.converged)
    root = os.path.join(str(tmp_path), "Rocket2D", "SC")
    runs = os.listdir(root)
    assert len(runs) == 1
    iters = sorted(os.listdir(os.path.join(root, runs[0])), key=int)
    assert len(iters) == int(res.iterations) + 1
    X, U, t = read_trajectory(os.path.join(root, runs[0], iters[-1]))
    assert X.shape == (25, 6)
    assert U.shape == (25, 2)
    assert 13.0 < float(t) < 18.0


def test_reference_config_ingestion_cli(tmp_path):
    """Stock SCpp .info files configure the driver verbatim."""
    ref = "/root/reference/scpp_models/config/Rocket2D"
    if not os.path.isdir(ref):
        pytest.skip("reference configs not present")
    from scpp_tpu.configs.algorithms import MPCConfig, SCConfig, SCvxConfig

    sc = SCConfig.from_info(os.path.join(ref, "SC.info"))
    assert sc.K == 25 and sc.free_final_time and sc.max_iterations == 15
    assert sc.weight_virtual_control == 1000.0
    scvx = SCvxConfig.from_info(os.path.join(ref, "SCvx.info"))
    assert scvx.K == 30 and scvx.trust_region == 5.0
    mpc = MPCConfig.from_info(os.path.join(ref, "MPC.info"), 6, 2)
    assert mpc.K == 7 and mpc.time_horizon == 1.5
    assert mpc.input_weights == (0.1, 0.1)  # scaling applied
