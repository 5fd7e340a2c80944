"""Blender animation import for RocketQuat trajectories.

Counterpart of the reference's Starship Blender script
(/root/reference/evaluation/RocketQuat/import_starship.py:1-77), written
as a reusable module rather than a scene-specific macro: it reads the
framework's golden-format output (`output/<Model>/<Algo>/<ts>/<iter>/
{X,U,t}.txt`, the reference interchange format), and keyframes

  - the vehicle body's location + quaternion attitude per node,
  - engine gimbal angles derived from the thrust vector,
  - an exhaust-plume scale + light energy proportional to throttle,

over the scene timeline at the trajectory's physical duration. Unlike the
reference (which requires a hand-built .blend with specifically named
objects and crashes otherwise), missing objects are created as procedural
placeholders (cylinder body, cone plume, point light), so the script runs
against an EMPTY scene — open Blender, load this file in the scripting
tab, run.

Run inside Blender (bpy is Blender's embedded module; this file has no
use outside it):

    blender --python evaluation/blender_rocket_quat.py -- \
        [output/RocketQuat/SC/<timestamp>/<iter>]

With no argument the newest run/iterate under output/RocketQuat is used.
"""

import os
import sys

import numpy as np

try:
    import bpy
except ImportError:  # pragma: no cover - bpy exists only inside Blender
    raise SystemExit("blender_rocket_quat.py must run inside Blender "
                     "(blender --python evaluation/blender_rocket_quat.py)")


def latest_run(base="output/RocketQuat"):
    """Newest <algo>/<timestamp>/<iter> directory under ``base``."""
    algos = [os.path.join(base, d) for d in sorted(os.listdir(base))]
    runs = [os.path.join(a, r) for a in algos if os.path.isdir(a)
            for r in sorted(os.listdir(a))]
    iters = [os.path.join(r, i) for r in runs if os.path.isdir(r)
             for i in sorted(os.listdir(r), key=lambda s: int(s))]
    if not iters:
        raise FileNotFoundError(f"no runs under {base}")
    return iters[-1]


def load_trajectory(run_dir):
    X = np.genfromtxt(os.path.join(run_dir, "X.txt"), delimiter=",")
    U = np.genfromtxt(os.path.join(run_dir, "U.txt"), delimiter=",")
    t = float(np.genfromtxt(os.path.join(run_dir, "t.txt"), delimiter=","))
    return X, U, t


def _ensure(name, make):
    ob = bpy.data.objects.get(name)
    if ob is None:
        make()
        ob = bpy.context.active_object
        ob.name = name
    return ob


def build_placeholder_rig():
    """Create body/plume/light placeholders if the scene lacks them."""
    body = _ensure("RocketBody", lambda: bpy.ops.mesh.primitive_cylinder_add(
        radius=1.8, depth=45.0))
    body.rotation_mode = "QUATERNION"
    plume = _ensure("Plume", lambda: bpy.ops.mesh.primitive_cone_add(
        radius1=1.2, radius2=0.2, depth=12.0))
    plume.parent = body
    plume.location = (0.0, 0.0, -28.0)
    plume.rotation_mode = "XYZ"
    light = bpy.data.lights.get("PlumeLight")
    if light is None:
        light = bpy.data.lights.new("PlumeLight", type="POINT")
        lo = bpy.data.objects.new("PlumeLight", light)
        bpy.context.collection.objects.link(lo)
        lo.parent = body
        lo.location = (0.0, 0.0, -30.0)
    return body, plume, light


def animate(run_dir=None, scale=0.01):
    """Keyframe the trajectory onto the rig; returns (K, n_frames)."""
    run_dir = run_dir or latest_run()
    X, U, t = load_trajectory(run_dir)
    K = X.shape[0]

    scene = bpy.context.scene
    fps = scene.render.fps
    n_frames = max(int(round(t * fps)), K)
    scene.frame_start = 0
    scene.frame_end = n_frames

    body, plume, light = build_placeholder_rig()
    for ob in (body, plume):
        ob.animation_data_clear()

    T_max = float(np.max(np.linalg.norm(U[:, :3], axis=1)))
    for k in range(K):
        frame = int(round(k * n_frames / max(K - 1, 1)))
        scene.frame_current = frame
        x, u = X[k], U[min(k, U.shape[0] - 1)]

        # state layout (m, r, v, q_wxyz, w) — models/rocket_quat.py
        body.location = tuple(scale * x[1:4])
        body.rotation_quaternion = tuple(x[7:11])
        body.keyframe_insert("location", frame=frame)
        body.keyframe_insert("rotation_quaternion", frame=frame)

        # gimbal: thrust direction in body frame -> engine tilt
        tz = max(float(u[2]), 1e-9)
        plume.rotation_euler = (float(np.arctan2(-u[1], tz)),
                                float(np.arctan2(u[0], tz)), 0.0)
        throttle = float(np.linalg.norm(u[:3])) / max(T_max, 1e-9)
        plume.scale = (1.0, 1.0, 0.4 + 0.6 * throttle)
        plume.keyframe_insert("rotation_euler", frame=frame)
        plume.keyframe_insert("scale", frame=frame)
        light.energy = 2000.0 * throttle
        light.keyframe_insert("energy", frame=frame)

    # engine cutoff after touchdown
    scene.frame_current = min(n_frames + fps // 6, scene.frame_end)
    plume.scale = (1.0, 1.0, 0.0)
    plume.keyframe_insert("scale")
    light.energy = 0.0
    light.keyframe_insert("energy")
    scene.frame_current = 0
    return K, n_frames


if __name__ == "__main__":
    argv = sys.argv[sys.argv.index("--") + 1:] if "--" in sys.argv else []
    animate(argv[0] if argv else None)
