"""Numerics-sanitizer lane (SURVEY §5: the reference has no sanitizers;
the TPU equivalents are jax debug_nans + determinism checks).

- ``jax_debug_nans`` raises on any NaN *produced* inside jitted code, so
  a passing solve certifies the healthy path manufactures no NaNs that
  the failure-masking machinery then hides (masked failures are only for
  genuinely pathological inputs, not routine operation).
- Determinism: the same jitted solve twice must be bitwise identical —
  XLA programs are deterministic on a device; any divergence means
  nondeterministic memory effects (or a host-side data leak into the
  trace), which would also break the sharded-equality contract.
"""

import jax
import numpy as np
import pytest

from scpp_tpu.algos.sc import solve_sc
from scpp_tpu.algos.scvx import solve_scvx
from scpp_tpu.configs.algorithms import SCConfig, SCvxConfig
from scpp_tpu.models import Rocket2D
from scpp_tpu.solver.ipm import IPMSettings


@pytest.fixture
def debug_nans():
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", False)


def test_scvx_clean_under_debug_nans(debug_nans):
    cfg = SCvxConfig(K=8, solve_budget=14, max_iterations=12,
                     substeps=4, sim_substeps=5,
                     solver=IPMSettings(iters=20))
    r = solve_scvx(Rocket2D, Rocket2D.default_params(), cfg)
    assert np.isfinite(float(np.asarray(r.max_residual)))


def test_sc_clean_under_debug_nans(debug_nans):
    cfg = SCConfig(K=10, max_iterations=6, substeps=4, sim_substeps=5,
                   solver=IPMSettings(iters=20))
    r = solve_sc(Rocket2D, Rocket2D.default_params(), cfg)
    assert bool(np.asarray(r.converged))


def test_solve_deterministic():
    cfg = SCvxConfig(K=8, solve_budget=10, max_iterations=8,
                     substeps=4, sim_substeps=5,
                     solver=IPMSettings(iters=20))
    p = Rocket2D.default_params()
    r1 = solve_scvx(Rocket2D, p, cfg)
    r2 = solve_scvx(Rocket2D, p, cfg)
    np.testing.assert_array_equal(np.asarray(r1.td.U), np.asarray(r2.td.U))
    np.testing.assert_array_equal(np.asarray(r1.td.X), np.asarray(r2.td.X))
