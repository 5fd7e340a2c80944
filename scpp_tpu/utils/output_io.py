"""Trajectory text output in the reference golden-file format.

Parity with the reference writers (scpp/src/SC_oneshot.cpp:29-64,
SC_sim.cpp:73-103, MPC_sim.cpp:93-129): per-run directory
``output/<Model>/<Algo>/<timestamp>/<iter>/`` containing ``X.txt`` /
``U.txt`` (one node per line, ", "-separated) and ``t.txt`` (scalar for
trajectory dumps, one-per-line for sim histories). This is the
interchange format the reference's evaluation scripts consume, kept
byte-compatible for cross-framework comparison.
"""

from __future__ import annotations

import os
import time
from typing import Sequence

import numpy as np

__all__ = ["write_trajectory", "write_sim_history", "read_trajectory",
           "get_time_string", "reduce_vector"]


def get_time_string() -> str:
    """%Y_%m_%d_%H_%M_%S (commonFunctions.cpp:72-78)."""
    return time.strftime("%Y_%m_%d_%H_%M_%S")


def reduce_vector(v: Sequence, steps: int):
    """Downsample to ~steps entries (commonFunctions.hpp:19-32)."""
    v = list(v)
    if len(v) <= steps:
        return v
    stride = max(1, len(v) // steps)
    return v[::stride]


def _write_rows(path: str, rows: np.ndarray):
    with open(path, "w") as f:
        for row in np.atleast_2d(rows):
            f.write(", ".join(repr(float(x)) for x in row) + "\n")


def write_trajectory(outdir: str, X, U, t) -> str:
    """Write one trajectory as <outdir>/{X,U,t}.txt (SC_oneshot.cpp:44-62)."""
    os.makedirs(outdir, exist_ok=True)
    _write_rows(os.path.join(outdir, "X.txt"), np.asarray(X))
    _write_rows(os.path.join(outdir, "U.txt"), np.asarray(U))
    with open(os.path.join(outdir, "t.txt"), "w") as f:
        f.write(repr(float(t)))
    return outdir


def write_sim_history(outdir: str, X, U, ts, write_steps: int = 30) -> str:
    """Write a downsampled closed-loop history (MPC_sim.cpp:105-128)."""
    os.makedirs(outdir, exist_ok=True)
    X = np.stack(reduce_vector(np.asarray(X), write_steps))
    U = np.stack(reduce_vector(np.asarray(U), write_steps))
    ts = reduce_vector(np.asarray(ts), write_steps)
    _write_rows(os.path.join(outdir, "X.txt"), X)
    _write_rows(os.path.join(outdir, "U.txt"), U)
    with open(os.path.join(outdir, "t.txt"), "w") as f:
        for t in ts:
            f.write(repr(float(t)) + "\n")
    return outdir


def read_trajectory(outdir: str):
    """Read back an {X,U,t}.txt directory (either format)."""
    X = np.loadtxt(os.path.join(outdir, "X.txt"), delimiter=",", ndmin=2)
    U = np.loadtxt(os.path.join(outdir, "U.txt"), delimiter=",", ndmin=2)
    t = np.loadtxt(os.path.join(outdir, "t.txt"))
    return X, U, t
