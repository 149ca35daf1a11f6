"""Bisect the round-3 meshgrad TPU device fault (VERDICT r3 item 1).

The battery's meshgrad tier (packet-BVH Pallas forward + wavefront-VJP
backward under one jit) crashed the chip twice with
``UNAVAILABLE: TPU device error``.  Each step below runs ONE candidate
component in its OWN subprocess (a device fault cannot poison the next
step), smallest program first:

  fwd_packet    packet-BVH Pallas forward alone (known-good: mesh tier)
  fwd_loss      same forward wrapped in jit(mean-loss) (no grad)
  wf_fwd        wavefront render_flat forward at grad_spp
  wf_grad       jax.grad of the wavefront loss at grad_spp (no Pallas)
  hybrid        the full custom_vjp composition (the faulting tier)

Usage: python benchmarks/meshgrad_bisect.py [--step NAME] [--scene mesh1600]
With no --step, orchestrates all steps as subprocesses and prints a table.
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

W, H, SPP, DEPTH, GRAD_SPP = 640, 360, 16, 4, 2

STEPS = ["fwd_packet", "fwd_loss", "wf_fwd", "wf_grad", "hybrid"]


def _scene(name):
    from spira_tpu.accel.pairs import attach_packed
    from spira_tpu.scene.camera import make_camera
    from spira_tpu.scene.scene import create_mesh_scene

    if name == "mesh1600":
        scene = attach_packed(create_mesh_scene(subdivisions=3))
    elif name == "bunny":
        from spira_tpu.scene.bunny import bunny_camera, create_bunny_scene

        scene, _ = create_bunny_scene(allow_download=False)
        return scene, bunny_camera(W / H)
    else:
        raise ValueError(name)
    cam = make_camera(lookfrom=(0.0, 1.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      aspect_ratio=W / H)
    return scene, cam


def run_step(step, scene_name):
    import jax
    import jax.numpy as jnp

    from spira_tpu.core.types import replace

    scene, cam = _scene(scene_name)
    a0 = scene.materials.albedo
    kw = dict(width=W, height=H, max_depth=DEPTH)

    if step == "fwd_packet":
        from spira_tpu.kernels.bvh_megakernel import render_flat_bvh_megakernel

        out = render_flat_bvh_megakernel(scene, cam, spp=SPP, seed=0, **kw)
    elif step == "fwd_loss":
        from spira_tpu.kernels.bvh_megakernel import render_flat_bvh_megakernel

        @jax.jit
        def f(albedo, seed):
            sc = replace(scene, materials=replace(scene.materials,
                                                  albedo=albedo))
            img = render_flat_bvh_megakernel(sc, cam, spp=SPP, seed=seed, **kw)
            return jnp.mean(img)

        out = f(a0, jnp.int32(0))
    elif step == "wf_fwd":
        from spira_tpu.render import render_flat

        out = render_flat(scene, cam, spp=GRAD_SPP, seed=0,
                          semantics="physical", **kw)
    elif step == "wf_grad":
        from spira_tpu.render import render_flat

        @jax.jit
        def f(albedo, seed):
            sc = replace(scene, materials=replace(scene.materials,
                                                  albedo=albedo))
            img = render_flat(sc, cam, spp=GRAD_SPP, seed=seed,
                              semantics="physical", **kw)
            return jnp.mean(img)

        out = jax.value_and_grad(f)(a0, jnp.int32(0))[1]
    elif step == "hybrid":
        from spira_tpu.render import render_flat_hybrid_grad_mesh

        @jax.jit
        def f(albedo, seed):
            sc = replace(scene, materials=replace(scene.materials,
                                                  albedo=albedo))
            img = render_flat_hybrid_grad_mesh(
                sc, cam, spp=SPP, seed=seed, grad_spp=GRAD_SPP, **kw)
            return jnp.mean(img)

        out = jax.value_and_grad(f)(a0, jnp.int32(0))[1]
    else:
        raise ValueError(step)

    jax.block_until_ready(out)
    import numpy as np

    finite = bool(np.isfinite(np.asarray(
        jax.tree_util.tree_leaves(out)[0])).all())
    print(json.dumps({"step": step, "scene": scene_name, "ok": True,
                      "finite": finite}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step", default="")
    ap.add_argument("--scene", default="mesh1600")
    args = ap.parse_args()
    if args.step:
        run_step(args.step, args.scene)
        return
    results = []
    for step in STEPS:
        t0 = time.time()
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--step", step, "--scene", args.scene],
                cwd=ROOT, capture_output=True, text=True, timeout=1200)
            ok = out.returncode == 0
            tail = "\n".join((out.stderr or "").strip().splitlines()[-8:])
            results.append((step, ok, time.time() - t0,
                            "" if ok else tail))
        except subprocess.TimeoutExpired:
            results.append((step, False, time.time() - t0, "TIMEOUT"))
        print(f"[{step}] {'OK' if results[-1][1] else 'FAIL'} "
              f"({results[-1][2]:.0f}s)", flush=True)
        if not results[-1][1]:
            print(results[-1][3], flush=True)
    print("\n=== bisect summary ===")
    for step, ok, dt, tail in results:
        print(f"{step:12s} {'OK' if ok else 'FAIL':4s} {dt:6.0f}s")


if __name__ == "__main__":
    main()
