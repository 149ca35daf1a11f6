"""Round-3 engine timings on real hardware (one TPU chip).

Measures the engines landed this round that have never been TPU-timed:

* ``bvh_sorted``        — per-bounce (dead, octant) ray regrouping feeding
  the packet traversal (render.py:render_flat_bvh_sorted), RGB + spectral;
* ``pallas_spectral_bvh`` — the spectral packet-BVH megakernel
  (kernels/spectral_bvh.py), which removed the 32-tri spectral ceiling;
* the packet-BVH baseline on the same scenes for the round-over-round
  mesh-throughput comparison (VERDICT round-2 item 3 targets:
  >= 50 Mrays/s at the 5.4k-tri tier, >= 30 at the 73k bunny tier).

Tiers (``--tier``): ``smoke`` forces a tiny-shape Mosaic compile of every
new kernel first (fail fast, warm the remote-compile cache); ``mesh``
times RGB mesh engines at the flagship config; ``spectral`` times the
spectral engines.  Results append as JSON lines to
``benchmarks/round3_timings.jsonl`` and print one line per point.

Usage: python benchmarks/round3_timings.py [--tier smoke|mesh|spectral|all]
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
                    "round3_timings.jsonl")


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
    assert np.isfinite(np.asarray(out)).all()
    return dt, compile_s


def _mesh_scene(subdivisions=4):
    from spira_tpu.scene.camera import make_camera
    from spira_tpu.scene.scene import create_mesh_scene
    from spira_tpu.accel.pairs import attach_packed

    # subdivisions=4 -> 5440 tris (the round-2 "5.4k tier"); 3 -> 1600
    scene = attach_packed(create_mesh_scene(subdivisions=subdivisions))
    cam = make_camera(lookfrom=(0.0, 1.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      aspect_ratio=W / H)
    return scene, cam, int(scene.triangles.count)


def _bunny_scene():
    from spira_tpu.scene.bunny import bunny_camera, create_bunny_scene

    scene, info = create_bunny_scene(allow_download=False)
    return scene, bunny_camera(W / H), int(info["triangles"])


def _spectral_mesh_scene(subdivisions=4):
    """A >5k-tri mesh under spectral materials (dispersive glass sphere,
    emissive light) — the scene class the round-2 engines could not run in
    one dispatch."""
    from spira_tpu.accel.bvh import build_bvh_for_triangles
    from spira_tpu.accel.pairs import attach_packed
    from spira_tpu.scene.camera import make_camera
    from spira_tpu.scene.geometry import make_spheres
    from spira_tpu.scene.materials import make_materials
    from spira_tpu.scene.obj import icosphere
    from spira_tpu.scene.scene import make_scene

    mesh = icosphere(center=(0.0, 0.3, 0.0), radius=0.6,
                     subdivisions=subdivisions, material=0)
    materials = make_materials(
        [
            dict(albedo=(0.7, 0.3, 0.3), metallic=0.0, roughness=0.5),
            dict(albedo=(0.5, 0.5, 0.5), metallic=0.0, roughness=0.9),
            dict(albedo=(1.0, 1.0, 1.0), emission=(5.0, 5.0, 5.0)),
            dict(albedo=(1.0, 1.0, 1.0), metallic=0.0, roughness=0.0,
                 ior=1.5, transmission=1.0, cauchy_b=0.01),
        ]
    )
    spheres = make_spheres(
        [
            ((0.0, -100.5, 0.0), 100.0, 1),
            ((0.0, 5.0, 0.0), 1.0, 2),
            ((1.1, 0.0, 0.4), 0.35, 3),
        ]
    )
    scene = make_scene(spheres=spheres, triangles=mesh, materials=materials,
                       bvh=build_bvh_for_triangles(mesh))
    cam = make_camera(lookfrom=(0.0, 1.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      aspect_ratio=W / H)
    return attach_packed(scene), cam, int(mesh.count)


def tier_smoke():
    """Tiny-shape Mosaic compiles of every kernel new this round."""
    from spira_tpu.kernels.spectral_bvh import (
        render_flat_spectral_bvh_megakernel,
    )
    from spira_tpu.render import render_flat_bvh_sorted

    scene, cam, ntris = _mesh_scene()
    sscene, scam, sntris = _spectral_mesh_scene(subdivisions=1)
    tiny = dict(width=256, height=128, spp=1, max_depth=2)

    from spira_tpu.accel.mxu import attach_superleaf
    from spira_tpu.kernels.bvh_megakernel import render_flat_bvh_megakernel

    scene_sl = attach_superleaf(scene)
    for name, fn in [
        ("pallas_bvh_mxu", lambda i: render_flat_bvh_megakernel(
            scene_sl, cam, **tiny, seed=i, mxu_leaf=True)),
        ("bvh_sorted", lambda i: render_flat_bvh_sorted(
            scene, cam, **tiny, seed=i)),
        ("bvh_sorted_spectral", lambda i: render_flat_bvh_sorted(
            sscene, scam, **tiny, seed=i, spectral=True)),
        ("spectral_bvh", lambda i: render_flat_spectral_bvh_megakernel(
            sscene, scam, **tiny, seed=i)),
    ]:
        try:
            dt, compile_s = _time(fn, 1)
            _record(tier="smoke", engine=name, ok=True,
                    compile_s=round(compile_s, 1), run_ms=round(dt * 1e3, 2))
        except Exception as e:
            _record(tier="smoke", engine=name, ok=False, error=repr(e))


def tier_mesh():
    from spira_tpu.accel.mxu import attach_superleaf
    from spira_tpu.kernels.bvh_megakernel import render_flat_bvh_megakernel
    from spira_tpu.render import render_flat_bvh_sorted

    rays = W * H * SPP * DEPTH
    kw = dict(width=W, height=H, spp=SPP, max_depth=DEPTH)
    for tier_name, scene_fn in [("mesh1600", lambda: _mesh_scene(3)),
                                ("mesh5440", _mesh_scene),
                                ("bunny", _bunny_scene)]:
        scene, cam, ntris = scene_fn()
        scene_sl = attach_superleaf(scene)
        for engine, fn in [
            ("pallas_bvh", lambda i: render_flat_bvh_megakernel(
                scene, cam, **kw, seed=i)),
            ("pallas_bvh_mxu", lambda i: render_flat_bvh_megakernel(
                scene_sl, cam, **kw, seed=i, mxu_leaf=True)),
            # note: Precision.HIGH (3 bf16 passes) is rejected by Mosaic
            # ("Unsupported dot precision: HIGH") — only highest/default
            ("pallas_bvh_mxu_bf16", lambda i: render_flat_bvh_megakernel(
                scene_sl, cam, **kw, seed=i, mxu_leaf=True,
                mxu_precision="default")),
            ("bvh_sorted", lambda i: render_flat_bvh_sorted(
                scene, cam, **kw, seed=i)),
            ("bvh_nosort", lambda i: render_flat_bvh_sorted(
                scene, cam, **kw, seed=i, sort=False)),
        ]:
            try:
                dt, compile_s = _time(fn, 5)
                _record(tier="mesh", scene=tier_name, tris=ntris,
                        engine=engine, mrays_s=round(rays / dt / 1e6, 1),
                        run_ms=round(dt * 1e3, 1),
                        compile_s=round(compile_s, 1))
            except Exception as e:
                _record(tier="mesh", scene=tier_name, tris=ntris,
                        engine=engine, ok=False, error=repr(e))


def tier_meshgrad():
    """Differentiable MESH step (fwd packet-BVH Pallas + bwd wavefront VJP
    at grad_spp=2): the mesh analogue of the bench.py hybrid headline."""
    import jax
    import jax.numpy as jnp

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
            _record(tier="meshgrad", scene=tier_name, tris=ntris,
                    engine="hybrid_mesh fwd-pallas_bvh/bwd-wavefront",
                    fwd_bwd_mrays_s=round(rays / dt / 1e6, 1),
                    grad_spp=2, run_ms=round(dt * 1e3, 1),
                    compile_s=round(compile_s, 1))
        except Exception as e:
            _record(tier="meshgrad", scene=tier_name, tris=ntris,
                    engine="hybrid_mesh", ok=False, error=repr(e))


def tier_adaptive():
    """Adaptive vs uniform wall time at the mesh flagship config: the win
    is real when frames are expensive (per-round dispatch+sync overhead is
    fixed, ~tens of ms through the tunnel, so cheap sphere frames lose)."""
    from spira_tpu.pipeline import render_adaptive
    from spira_tpu.render import render_flat_bvh_sorted
    from spira_tpu.utils.config import RenderConfig

    scene, cam, ntris = _mesh_scene(4)
    spp = 64
    cfg = RenderConfig(width=W, height=H, spp=spp, max_depth=DEPTH,
                       progress=False)
    try:
        # uniform baseline: one sorted-packet dispatch at the spp cap
        dt_u, _ = _time(lambda i: render_flat_bvh_sorted(
            scene, cam, width=W, height=H, spp=spp, max_depth=DEPTH,
            seed=i), 2)
        # adaptive: compile rounds once (first call), then time
        render_adaptive(scene, cam, cfg, tol=0.05, min_spp=8)
        t0 = time.perf_counter()
        _, stats = render_adaptive(scene, cam, cfg, tol=0.05, min_spp=8,
                                   return_stats=True)
        dt_a = time.perf_counter() - t0
        _record(tier="adaptive", scene="mesh5440", tris=ntris, spp_cap=spp,
                tol=0.05, uniform_s=round(dt_u, 3), adaptive_s=round(dt_a, 3),
                speedup=round(dt_u / dt_a, 2),
                samples_saved_pct=round(100 * stats["savings"], 1),
                dispatch_saved_pct=round(
                    100 * stats["dispatch_savings"], 1))
    except Exception as e:
        _record(tier="adaptive", scene="mesh5440", ok=False, error=repr(e))


def tier_spectral():
    from spira_tpu.kernels.spectral_bvh import (
        render_flat_spectral_bvh_megakernel,
    )
    from spira_tpu.render import render_flat_bvh_sorted

    rays = W * H * SPP * DEPTH
    kw = dict(width=W, height=H, spp=SPP, max_depth=DEPTH)
    scene, cam, ntris = _spectral_mesh_scene(subdivisions=4)
    for engine, fn in [
        ("pallas_spectral_bvh", lambda i: render_flat_spectral_bvh_megakernel(
            scene, cam, **kw, seed=i)),
        ("bvh_sorted_spectral", lambda i: render_flat_bvh_sorted(
            scene, cam, **kw, seed=i, spectral=True)),
    ]:
        try:
            dt, compile_s = _time(fn, 5)
            _record(tier="spectral", scene="spectral_mesh", tris=ntris,
                    engine=engine, mrays_s=round(rays / dt / 1e6, 1),
                    run_ms=round(dt * 1e3, 1), compile_s=round(compile_s, 1))
        except Exception as e:
            _record(tier="spectral", scene="spectral_mesh", tris=ntris,
                    engine=engine, ok=False, error=repr(e))

    # spectral Cornell (BASELINE config 2) at the round-2 showcase shape,
    # re-verified on-chip through the spectral packet engine's dispatch
    from spira_tpu.scene.scene import cornell_camera, create_cornell_box
    from spira_tpu.kernels.spectral_fused import (
        render_flat_spectral_megakernel,
    )

    cscene = create_cornell_box()
    ccam = cornell_camera(1.0)
    ckw = dict(width=512, height=512, spp=128, max_depth=6)
    crays = 512 * 512 * 128 * 6
    try:
        dt, compile_s = _time(lambda i: render_flat_spectral_megakernel(
            cscene, ccam, **ckw, seed=i), 3)
        _record(tier="spectral", scene="cornell512_spp128",
                engine="pallas_spectral", s_per_frame=round(dt, 3),
                grays_s=round(crays / dt / 1e9, 2),
                compile_s=round(compile_s, 1))
    except Exception as e:
        _record(tier="spectral", scene="cornell512_spp128",
                engine="pallas_spectral", ok=False, error=repr(e))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default="all",
                    choices=["smoke", "mesh", "meshgrad", "spectral",
                             "adaptive", "all"])
    args = ap.parse_args()
    tiers = (["smoke", "mesh", "spectral", "meshgrad", "adaptive"]
             if args.tier == "all" else [args.tier])
    for t in tiers:
        {"smoke": tier_smoke, "mesh": tier_mesh, "meshgrad": tier_meshgrad,
         "spectral": tier_spectral, "adaptive": tier_adaptive}[t]()


if __name__ == "__main__":
    main()
