"""Convergence check across saved SC iterations.

Counterpart of evaluation/RocketQuat/eval_3D.py:17-18: prints the L1
difference between the last two iterations of a run (plus the full
per-iteration convergence table).

  python evaluation/eval_convergence.py [run_dir]
"""

from __future__ import annotations

import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
from scpp_tpu.utils.output_io import read_trajectory  # noqa: E402


def main():
    if len(sys.argv) > 1:
        run = sys.argv[1]
    else:
        runs = sorted(glob.glob(os.path.join("output", "*", "*", "*")))
        if not runs:
            raise SystemExit("no runs under output/")
        run = runs[-1]

    iters = sorted((d for d in os.listdir(run)
                    if os.path.isdir(os.path.join(run, d))), key=int)
    prev = None
    for it in iters:
        X, U, t = read_trajectory(os.path.join(run, it))
        if prev is not None:
            dX = np.abs(X - prev[0]).sum()
            dU = np.abs(U - prev[1]).sum()
            print(f"iter {it}: |dX|_1 = {dX:.6e}  |dU|_1 = {dU:.6e}  "
                  f"t = {float(np.atleast_1d(t)[0]):.4f}")
        prev = (X, U, t)


if __name__ == "__main__":
    main()
