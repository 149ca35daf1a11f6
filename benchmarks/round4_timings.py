"""Round-4 engine timings on real hardware (one TPU chip).

Measures the round-4 deliverables (VERDICT r3 "next round" items):

* ``meshgrad``      — the FIXED differentiable mesh step: packet-BVH Pallas
  forward + the differentiable packet-hook backward (the round-3 wavefront
  backward faulted the chip; bisected to the stackless-traversal wavefront
  composition, `benchmarks/meshgrad_bisect.py` + `wf_fault_probe.py`).
  Records mrays_s AND a finite-loss check per scene.
* ``mesh``          — packet-engine tiers (MXU experiments pruned from the
  battery per VERDICT item 6; see spira_tpu/experiments.py).
* ``spectral``      — spectral packet engine incl. the NEW bunny-scale row,
  plus the Cornell showcase.
* ``spectralgrad``  — spectral mesh hybrid gradients (spectral packet
  forward + spectral wavefront replay through the packet hook).
* ``adaptive``      — tol sweep x two scenes with equal-time RMSE columns.

Results append as JSON lines to ``benchmarks/round4_timings.jsonl``.

Usage: python benchmarks/round4_timings.py [--tier ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W, H, SPP, DEPTH = 640, 360, 16, 4

_OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "round4_timings.jsonl")


def _record(**kw):
    import jax

    kw.setdefault("backend", jax.default_backend())
    kw.setdefault("ts", time.strftime("%Y-%m-%dT%H:%M:%S"))
    with open(_OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def _time(fn, iters):
    import jax
    import numpy as np

    t_c0 = time.perf_counter()
    out = jax.block_until_ready(fn(0))  # compile + warmup
    compile_s = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(i + 1)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(np.asarray(
        jax.tree_util.tree_leaves(out)[0])).all()
    return dt, compile_s


def _mesh_scene(subdivisions=4):
    from spira_tpu.accel.pairs import attach_packed
    from spira_tpu.scene.camera import make_camera
    from spira_tpu.scene.scene import create_mesh_scene

    # subdivisions=4 -> 5440 tris (the "5.4k tier"); 3 -> 1600
    scene = attach_packed(create_mesh_scene(subdivisions=subdivisions))
    cam = make_camera(lookfrom=(0.0, 1.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      aspect_ratio=W / H)
    return scene, cam, int(scene.triangles.count)


def _bunny_scene():
    from spira_tpu.scene.bunny import bunny_camera, create_bunny_scene

    scene, info = create_bunny_scene(allow_download=False)
    return scene, bunny_camera(W / H), int(info["triangles"])


def tier_meshgrad():
    """Differentiable MESH step: packet-BVH Pallas forward + packet-hook
    backward at grad_spp=2 — the mesh analogue of the bench.py hybrid
    headline, previously unmeasurable (round-3 chip fault)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spira_tpu.render import render_flat_hybrid_grad_mesh

    rays = W * H * SPP * DEPTH
    kw = dict(width=W, height=H, spp=SPP, max_depth=DEPTH)
    for tier_name, scene_fn in [("mesh1600", lambda: _mesh_scene(3)),
                                ("bunny", _bunny_scene)]:
        try:
            scene, cam, ntris = scene_fn()
        except Exception as e:
            _record(tier="meshgrad", scene=tier_name, ok=False,
                    error=repr(e))
            continue
        a0 = scene.materials.albedo

        @jax.jit
        def step(albedo, seed, _scene=scene, _cam=cam):
            from spira_tpu.core.types import replace

            def loss_fn(a):
                sc = replace(_scene,
                             materials=replace(_scene.materials, albedo=a))
                img = render_flat_hybrid_grad_mesh(
                    sc, _cam, **kw, seed=seed, grad_spp=2)
                return jnp.mean(img)

            return jax.value_and_grad(loss_fn)(albedo)

        try:
            dt, compile_s = _time(
                lambda i: step(a0, jnp.int32(i))[1], 3)
            loss, grad = jax.block_until_ready(step(a0, jnp.int32(0)))
            loss = float(loss)
            g = np.asarray(grad)
            _record(tier="meshgrad", scene=tier_name, tris=ntris,
                    engine="hybrid_mesh fwd-pallas_bvh/bwd-packet_hook",
                    fwd_bwd_mrays_s=round(rays / dt / 1e6, 1),
                    grad_spp=2, run_ms=round(dt * 1e3, 1),
                    compile_s=round(compile_s, 1),
                    loss=round(loss, 6),
                    loss_finite=bool(np.isfinite(loss)),
                    grad_finite=bool(np.isfinite(g).all()),
                    grad_max=round(float(np.abs(g).max()), 6))
        except Exception as e:
            _record(tier="meshgrad", scene=tier_name, tris=ntris,
                    engine="hybrid_mesh", ok=False, error=repr(e))


def tier_mesh():
    """Packet-engine mesh tiers (VERDICT item 2 scoreboard: the bars are
    >=50 Mrays/s @5.4k and >=30 @73k)."""
    from spira_tpu.kernels.bvh_megakernel import render_flat_bvh_megakernel

    rays = W * H * SPP * DEPTH
    kw = dict(width=W, height=H, spp=SPP, max_depth=DEPTH)
    for name, scene_fn in [("mesh1600", lambda: _mesh_scene(3)),
                           ("mesh5440", lambda: _mesh_scene(4)),
                           ("bunny", _bunny_scene)]:
        try:
            scene, cam, ntris = scene_fn()
        except Exception as e:
            _record(tier="mesh", scene=name, ok=False, error=repr(e))
            continue
        try:
            dt, compile_s = _time(lambda i: render_flat_bvh_megakernel(
                scene, cam, **kw, seed=i), 5)
            _record(tier="mesh", scene=name, tris=ntris,
                    engine="pallas_bvh",
                    mrays_s=round(rays / dt / 1e6, 1),
                    run_ms=round(dt * 1e3, 1),
                    compile_s=round(compile_s, 1))
        except Exception as e:
            _record(tier="mesh", scene=name, tris=ntris,
                    engine="pallas_bvh", ok=False, error=repr(e))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default="all",
                    choices=["meshgrad", "mesh", "all"])
    args = ap.parse_args()
    tiers = (["meshgrad", "mesh"] if args.tier == "all" else [args.tier])
    for t in tiers:
        {"meshgrad": tier_meshgrad, "mesh": tier_mesh}[t]()


if __name__ == "__main__":
    main()
