"""Pallas SOC-projection kernel vs the jnp reference (interpreter mode on
CPU; the compiled path runs on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from scpp_tpu.ops.soc_pallas import (
    soc_project_blocks, soc_project_blocks_reference,
)


@pytest.mark.parametrize("q", [2, 3, 5, 9])
@pytest.mark.parametrize("G", [1, 7, 30])
def test_soc_kernel_matches_reference(q, G):
    rng = np.random.default_rng(q * 100 + G)
    blocks = jnp.asarray(rng.standard_normal((G, q)) * 3.0)
    ref = soc_project_blocks_reference(blocks)
    out = soc_project_blocks(blocks, q, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)


def test_soc_kernel_cases():
    # interior (unchanged), below (-t dominates, zero), boundary projection
    blocks = jnp.asarray([
        [5.0, 1.0, 1.0],          # interior
        [-5.0, 1.0, 1.0],         # below -> 0
        [0.0, 3.0, 4.0],          # project: a = 2.5, z * 0.5
    ])
    out = np.asarray(soc_project_blocks(blocks, 3, interpret=True))
    np.testing.assert_allclose(out[0], [5.0, 1.0, 1.0])
    np.testing.assert_allclose(out[1], [0.0, 0.0, 0.0])
    np.testing.assert_allclose(out[2], [2.5, 1.5, 2.0])
