"""Multi-host (>=2 hosts) emulation gate (SURVEY §4 distributed strategy).

Runs tools/diag/multihost.py: two OS processes joined by
``jax.distributed.initialize`` (4 virtual CPU devices each, one global
8-device mesh), solving a dispersed stock Rocket2D SC batch sharded over
the global scenario axis, compared against a single-process run over the
same mesh shape. Asserts per-scenario bitwise equality and converged
solves — the only practical evidence for the BASELINE.json >=2-hosts
efficiency row without pod hardware.

~2-4 minutes on a 2-vCPU host (three interpreters compile the same
program); marked ``multihost`` so it can be deselected with
``-m 'not multihost'`` when iterating.
"""

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.multihost
def test_two_process_sharding_matches_single_process():
    env = dict(os.environ, MH_BATCH="8")
    env["PYTHONPATH"] = os.pathsep.join(
        filter(None, [env.get("PYTHONPATH"), _REPO]))
    # a fresh port per run avoids TIME_WAIT collisions with a prior run
    env["MH_PORT"] = "12387"
    r = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools/diag/multihost.py")],
        env=env, cwd=_REPO, capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, f"multihost failed:\n{r.stderr[-3000:]}"
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["bitwise_equal"], out
    assert out["converged_equal"], out
    assert out["converged"] == out["batch"], out
