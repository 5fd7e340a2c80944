"""Iteration browser for Rocket2D golden-file outputs.

Counterpart of the reference's evaluation/Rocket2D/plot_rocket2d.py:13-52:
reads output/Rocket2D/<Algo>/<run>/<iter>/{X,U,t}.txt and renders the
trajectory (position track with thrust vectors, plus state/input traces)
for a chosen iteration. Non-interactive by default (saves PNG).

  python evaluation/plot_rocket2d.py [run_dir] [--iteration N] [--out fig.png]
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


def latest_run(base="output/Rocket2D"):
    runs = sorted(glob.glob(os.path.join(base, "*", "*")))
    if not runs:
        raise SystemExit(f"no runs under {base}")
    return runs[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", nargs="?", default=None)
    ap.add_argument("--iteration", type=int, default=-1)
    ap.add_argument("--out", default="rocket2d.png")
    args = ap.parse_args()

    run = args.run_dir or latest_run()
    iters = sorted((d for d in os.listdir(run)
                    if os.path.isdir(os.path.join(run, d))), key=int)
    it = iters[args.iteration]
    X, U, t = read_trajectory(os.path.join(run, it))
    K = X.shape[0]

    fig, axes = plt.subplots(1, 3, figsize=(15, 5))
    ax = axes[0]
    ax.plot(X[:, 0], X[:, 1], "k.-")
    # attitude / thrust vectors (reference plot style: arrows along track)
    if U.shape[0] == K:
        scale = 1e-4
        for k in range(K):
            eta = X[k, 4]
            ang = eta + U[k, 0]
            dx, dy = np.sin(ang) * U[k, 1], -np.cos(ang) * U[k, 1]
            ax.arrow(X[k, 0], X[k, 1], dx * scale, dy * scale,
                     color="r", width=0.2)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.set_title(f"iteration {it}, t = {float(np.atleast_1d(t)[0]):.2f} s")
    ax.axis("equal")

    ts = np.linspace(0, float(np.atleast_1d(t)[0]), K)
    axes[1].plot(ts, X[:, 2], label="vx")
    axes[1].plot(ts, X[:, 3], label="vy")
    axes[1].plot(ts, np.degrees(X[:, 4]), label="eta [deg]")
    axes[1].legend()
    axes[1].set_xlabel("t [s]")
    axes[1].set_title("states")

    tu = np.linspace(0, float(np.atleast_1d(t)[0]), U.shape[0])
    axes[2].plot(tu, U[:, 1], "r", label="thrust [N]")
    ax2 = axes[2].twinx()
    ax2.plot(tu, np.degrees(U[:, 0]), "b", label="gimbal [deg]")
    axes[2].set_xlabel("t [s]")
    axes[2].set_title("inputs")
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
