"""Narrow the wavefront-mesh TPU fault (meshgrad_bisect: wf_fwd FAILs).

Runs the stackless BVH traversal standalone on the real chip at shrinking
sizes, then the stack-per-ray oracle, then brute-force triangles — each in
its own subprocess.  Usage: python benchmarks/wf_fault_probe.py [--step S]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

STEPS = [
    "bvh_230k", "bvh_16k", "bvh_1k",
    "stack_16k", "brute_16k", "mixed_16k",
]


def _scene():
    from spira_tpu.scene.camera import make_camera
    from spira_tpu.scene.scene import create_mesh_scene

    scene = create_mesh_scene(subdivisions=3)
    cam = make_camera(lookfrom=(0.0, 1.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      aspect_ratio=640 / 360)
    return scene, cam


def run_step(step):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spira_tpu.core import rng as srng
    from spira_tpu.scene.camera import generate_rays

    scene, cam = _scene()
    n = {"230k": 230400, "16k": 16384, "1k": 1024}[step.split("_")[1]]
    key = srng.sample_key(srng.base_key(0), 0)
    o, d = generate_rays(cam, 640, 360, key)
    o, d = o[:n], d[:n]

    kind = step.split("_")[0]
    if kind == "bvh":
        from spira_tpu.accel.traverse import intersect_bvh

        fn = jax.jit(lambda o, d: intersect_bvh(
            scene.bvh, scene.triangles, o, d))
    elif kind == "stack":
        from spira_tpu.accel.traverse import intersect_bvh_stack

        fn = jax.jit(lambda o, d: intersect_bvh_stack(
            scene.bvh, scene.triangles, o, d))
    elif kind == "brute":
        from spira_tpu.integrator.intersect import intersect_triangles

        fn = jax.jit(lambda o, d: intersect_triangles(
            scene.triangles, o, d))
    elif kind == "mixed":
        from spira_tpu.integrator.intersect import intersect_scene

        fn = jax.jit(lambda o, d: intersect_scene(scene, o, d))
    else:
        raise ValueError(step)
    hit = jax.block_until_ready(fn(o, d))
    t = np.asarray(hit.t)
    print(json.dumps({
        "step": step, "ok": True,
        "hits": int((t < 1e19).sum()), "n": n,
        "t_mean": float(t[t < 1e19].mean()) if (t < 1e19).any() else None,
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step", default="")
    args = ap.parse_args()
    if args.step:
        run_step(args.step)
        return
    for step in STEPS:
        t0 = time.time()
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--step", step],
                cwd=ROOT, capture_output=True, text=True, timeout=900)
            ok = out.returncode == 0
            tail = "\n".join((out.stdout + out.stderr).strip()
                             .splitlines()[-4:])
        except subprocess.TimeoutExpired:
            ok, tail = False, "TIMEOUT"
        print(f"[{step}] {'OK' if ok else 'FAIL'} ({time.time()-t0:.0f}s)"
              + ("" if ok else "\n" + tail), flush=True)


if __name__ == "__main__":
    main()
