"""Pallas SOC-projection kernel vs the jnp reference.

Interpreter-mode tests run everywhere (CPU CI); the COMPILED path runs
whenever a real TPU is attached — interpreter-only coverage is what let
the r02 bench ship a kernel whose Mosaic lowering crashed (`.at[:,0].set`
-> scatter, unimplemented on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpp_tpu.ops.soc_pallas import (
    soc_project_blocks, soc_project_blocks_reference,
)


# conftest pins this process to jax_platforms=cpu, so the compiled-path
# check must run in a fresh interpreter that can see the TPU. The
# subprocess prints SKIP if no TPU is attached, PASS <maxerr> otherwise.
_TPU_CHECK = """
import jax, numpy as np
import jax.numpy as jnp
tpus = [d for d in jax.devices() if d.platform == "tpu"]
if not tpus:
    print("SKIP"); raise SystemExit(0)
from scpp_tpu.ops.soc_pallas import (
    soc_project_blocks, soc_project_blocks_reference)
rng = np.random.default_rng(0)
errs = []
for q in (3, 9):
    blocks_h = (rng.standard_normal((30, q)) * 3.0).astype(np.float32)
    out = soc_project_blocks(jnp.asarray(blocks_h), q, False)
    ref = soc_project_blocks_reference(jnp.asarray(blocks_h))
    errs.append(float(jnp.max(jnp.abs(out - ref))))
print("PASS", max(errs))
"""


def test_soc_kernel_compiled_on_tpu():
    """The Mosaic-compiled kernel (interpret=False) on real hardware:
    lowering must succeed and match the jnp reference."""
    import os
    import subprocess
    import sys

    # inherit env verbatim (the TPU may be attached via a custom platform
    # plugin selected by JAX_PLATFORMS whose registration lives on the
    # existing PYTHONPATH) and APPEND the repo so scpp_tpu imports
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        filter(None, [env.get("PYTHONPATH"), repo]))
    try:
        r = subprocess.run([sys.executable, "-c", _TPU_CHECK], env=env,
                           capture_output=True, text=True, timeout=300)
    except subprocess.TimeoutExpired:
        # a healthy attached TPU compiles+runs this in well under a
        # minute; a tunnel that accepts connections but never executes
        # (transient outage) is indistinguishable from detached hardware
        # for this test's purpose
        pytest.skip("TPU attached but unresponsive within 300s")
    out = r.stdout.strip().splitlines()
    assert r.returncode == 0, f"subprocess failed:\n{r.stderr[-2000:]}"
    assert out, f"no output:\n{r.stderr[-2000:]}"
    if out[-1] == "SKIP":
        pytest.skip("no TPU attached")
    tag, err = out[-1].split()
    assert tag == "PASS" and float(err) < 1e-5, out[-1]


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
