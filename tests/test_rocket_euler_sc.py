"""End-to-end SC on RocketEuler — the README-advertised third model
(BASELINE.json config: 'SC_sim on RocketEuler')."""

import jax.numpy as jnp
import numpy as np
import pytest

from scpp_tpu.algos.common import interval_resimulation
from scpp_tpu.algos.sc import solve_sc
from scpp_tpu.configs.algorithms import SCConfig
from scpp_tpu.models import RocketEuler


@pytest.fixture(scope="module")
def sc_euler():
    p = RocketEuler.default_params()
    cfg = SCConfig(K=15, weight_trust_region_trajectory=5.0,
                   max_iterations=15)
    res = solve_sc(RocketEuler, p, cfg)
    return p, res


def test_euler_sc_lands(sc_euler):
    p, res = sc_euler
    X = np.asarray(res.td.X)
    n1 = np.asarray(res.norm1_nu)
    assert n1[-1] < 5e-4, f"virtual control {n1}"
    assert np.asarray(res.sum_delta)[-1] < 1e-3
    # touchdown: position/velocity zero, level attitude (free roll)
    np.testing.assert_allclose(X[-1, 1:7], 0.0, atol=1e-3)
    np.testing.assert_allclose(X[-1, 7:9], 0.0, atol=1e-3)
    assert X[-1, 0] >= float(p.x_final[0]) - 1.0
    # free final time found a feasible duration
    assert 10.0 < float(res.td.t) < 25.0


def test_euler_sc_near_feasible(sc_euler):
    p, res = sc_euler
    par = RocketEuler.param_vector(p)
    x_end = interval_resimulation(RocketEuler, par, res.td, substeps=16)
    defects = np.abs(np.asarray(x_end - res.td.X[1:]))
    m_scale = float(p.x_init[0])
    r_scale = float(jnp.linalg.norm(p.x_init[1:4]))
    scale = np.concatenate([[m_scale], np.full(6, r_scale), np.ones(6)])
    assert np.max(defects / scale[None, :]) < 2e-4


def test_euler_sc_constraints(sc_euler):
    p, res = sc_euler
    X = np.asarray(res.td.X)
    U = np.asarray(res.td.U)
    T = np.linalg.norm(U[:, :3], axis=1)
    assert np.all(T <= float(p.T_max) * (1 + 1e-6))
    assert np.all(U[:, 2] >= float(p.T_min) * (1 - 1e-3))
    # tilt box via the SOC on (roll, pitch)
    assert np.all(np.linalg.norm(X[:, 7:9], axis=1)
                  <= float(p.theta_max) + 1e-5)
    # glideslope
    assert np.all(np.linalg.norm(X[:, 1:3], axis=1)
                  <= np.tan(float(p.gamma_gs)) * X[:, 3] + 1e-2)
