"""3-D iteration browser for RocketQuat golden-file outputs.

Counterpart of evaluation/RocketQuat/plot_RocketQuat.py:31-89: reads
output/RocketQuat/<Algo>/<run>/<iter>/{X,U,t}.txt and renders the 3-D
descent track with thrust vectors, plus mass/attitude/thrust traces.

  python evaluation/plot_rocket_quat.py [run_dir] [--iteration N] [--out fig.png]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
from scpp_tpu.utils.output_io import read_trajectory  # noqa: E402


def _rotmat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])


def latest_run(base="output/RocketQuat"):
    runs = sorted(glob.glob(os.path.join(base, "*", "*")))
    if not runs:
        raise SystemExit(f"no runs under {base}")
    return runs[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", nargs="?", default=None)
    ap.add_argument("--iteration", type=int, default=-1)
    ap.add_argument("--out", default="rocket_quat.png")
    args = ap.parse_args()

    run = args.run_dir or latest_run()
    iters = sorted((d for d in os.listdir(run)
                    if os.path.isdir(os.path.join(run, d))), key=int)
    it = iters[args.iteration]
    X, U, t = read_trajectory(os.path.join(run, it))
    K = X.shape[0]
    tf = float(np.atleast_1d(t)[0])

    fig = plt.figure(figsize=(14, 6))
    ax = fig.add_subplot(1, 2, 1, projection="3d")
    ax.plot(X[:, 1], X[:, 2], X[:, 3], "k.-")
    if U.shape[0] == K:
        scale = 2e-4
        for k in range(K):
            R = _rotmat(X[k, 7:11] / np.linalg.norm(X[k, 7:11]))
            Tvec = R @ U[k, :3]
            ax.quiver(X[k, 1], X[k, 2], X[k, 3],
                      -Tvec[0] * scale, -Tvec[1] * scale, -Tvec[2] * scale,
                      color="r")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.set_zlabel("z [m]")
    ax.set_title(f"iteration {it}, t = {tf:.2f} s")

    ts = np.linspace(0, tf, K)
    tu = np.linspace(0, tf, U.shape[0])
    ax2 = fig.add_subplot(2, 2, 2)
    ax2.plot(ts, X[:, 0], label="mass [kg]")
    ax2.legend()
    ax3 = fig.add_subplot(2, 2, 4)
    ax3.plot(tu, np.linalg.norm(U[:, :3], axis=1), "r", label="|T| [N]")
    ax3.legend()
    ax3.set_xlabel("t [s]")
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
