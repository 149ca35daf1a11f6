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
    # bf16 leaf math measured 2x SLOWER (scalar-core downcasts; see
    # ARCHITECTURE "measured failures") — only re-measure it on demand
    precs = ("fp32", "bf16") if "--bf16" in sys.argv else ("fp32",)
    for name, scene_fn in [("mesh1600", lambda: _mesh_scene(3)),
                           ("mesh5440", lambda: _mesh_scene(4)),
                           ("bunny", _bunny_scene)]:
        try:
            scene, cam, ntris = scene_fn()
        except Exception as e:
            _record(tier="mesh", scene=name, ok=False, error=repr(e))
            continue
        for prec in precs:
            try:
                dt, compile_s = _time(lambda i: render_flat_bvh_megakernel(
                    scene, cam, **kw, seed=i, leaf_precision=prec), 5)
                _record(tier="mesh", scene=name, tris=ntris,
                        engine="pallas_bvh", leaf_precision=prec,
                        mrays_s=round(rays / dt / 1e6, 1),
                        run_ms=round(dt * 1e3, 1),
                        compile_s=round(compile_s, 1))
            except Exception as e:
                _record(tier="mesh", scene=name, tris=ntris,
                        engine="pallas_bvh", leaf_precision=prec,
                        ok=False, error=repr(e))


def _spectral_mesh_scene(subdivisions=4):
    """A mesh under spectral materials (dispersive glass sphere, emissive
    light) — same construction as the round-3 spectral tier."""
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


def tier_spectral():
    """Spectral engines: the 5.1k-tri row (round-over-round), the NEW
    bunny-scale spectral row (VERDICT item 4: 'spectral at scale'), and
    the Cornell showcase."""
    from spira_tpu.kernels.spectral_bvh import (
        render_flat_spectral_bvh_megakernel,
    )

    rays = W * H * SPP * DEPTH
    kw = dict(width=W, height=H, spp=SPP, max_depth=DEPTH)
    for name, scene_fn in [
        ("spectral_mesh5120", lambda: _spectral_mesh_scene(4)),
        ("spectral_bunny", _bunny_scene),
    ]:
        try:
            scene, cam, ntris = scene_fn()
            dt, compile_s = _time(
                lambda i: render_flat_spectral_bvh_megakernel(
                    scene, cam, **kw, seed=i), 5)
            _record(tier="spectral", scene=name, tris=ntris,
                    engine="pallas_spectral_bvh",
                    mrays_s=round(rays / dt / 1e6, 1),
                    run_ms=round(dt * 1e3, 1),
                    compile_s=round(compile_s, 1))
        except Exception as e:
            _record(tier="spectral", scene=name, engine="pallas_spectral_bvh",
                    ok=False, error=repr(e))

    # spectral mesh GRADIENTS on hardware (VERDICT item 4: a TPU
    # meshgrad-spectral row): spectral packet forward + spectral replay
    # through the differentiable packet hook
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spira_tpu.render import render_flat_hybrid_grad_mesh

    try:
        scene, cam, ntris = _spectral_mesh_scene(3)

        @jax.jit
        def step(spd, seed):
            from spira_tpu.core.types import replace

            def loss_fn(s):
                sc = replace(scene, materials=replace(
                    scene.materials, albedo_spd=s))
                img = render_flat_hybrid_grad_mesh(
                    sc, cam, **kw, seed=seed, grad_spp=2, spectral=True)
                return jnp.mean(img)

            return jax.value_and_grad(loss_fn)(spd)

        s0 = scene.materials.albedo_spd
        dt, compile_s = _time(lambda i: step(s0, jnp.int32(i))[1], 3)
        loss, grad = jax.block_until_ready(step(s0, jnp.int32(0)))
        g = np.asarray(grad)
        _record(tier="spectralgrad", scene="spectral_mesh1280", tris=ntris,
                engine="hybrid_mesh_spectral fwd-pallas/bwd-packet_hook",
                fwd_bwd_mrays_s=round(rays / dt / 1e6, 1), grad_spp=2,
                run_ms=round(dt * 1e3, 1), compile_s=round(compile_s, 1),
                loss=round(float(loss), 6),
                loss_finite=bool(np.isfinite(float(loss))),
                grad_finite=bool(np.isfinite(g).all()),
                grad_max=round(float(np.abs(g).max()), 6))
    except Exception as e:
        _record(tier="spectralgrad", scene="spectral_mesh1280", ok=False,
                error=repr(e))

    # spectral Cornell showcase (BASELINE config 2)
    from spira_tpu.kernels.spectral_fused import (
        render_flat_spectral_megakernel,
    )
    from spira_tpu.scene.scene import cornell_camera, create_cornell_box

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


def tier_adaptive():
    """Adaptive sampling, earned (VERDICT item 7): tol sweep × two scenes,
    recording wall time, samples saved AND image error — adaptive RMSE vs
    a high-spp reference, compared against uniform at the cap and against
    uniform at EQUAL TIME."""
    import jax
    import numpy as np

    import spira_tpu as st
    from spira_tpu.pipeline import render_adaptive
    from spira_tpu.render import render_flat_bvh_sorted, render_flat_engine
    from spira_tpu.utils.config import RenderConfig

    spp_cap = 64

    def rmse(a, b):
        return float(np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2)))

    scenes = []
    sph = st.create_scene()
    scenes.append(("demo_spheres", sph, st.default_camera(W / H), "pallas"))
    mscene, mcam, _ = _mesh_scene(4)
    scenes.append(("mesh5440", mscene, mcam, "bvh_sorted"))

    for name, scene, cam, engine in scenes:
        try:
            # high-spp ground truth (uniform, fast engine, one-off)
            ref = render_flat_engine(
                scene, cam, width=W, height=H, spp=512, max_depth=DEPTH,
                seed=999,
                engine="pallas" if engine == "pallas" else "pallas_bvh")
            jax.block_until_ready(ref)

            def uniform(spp, seed=5):
                if engine == "pallas":
                    return render_flat_engine(
                        scene, cam, width=W, height=H, spp=spp,
                        max_depth=DEPTH, seed=seed, engine="pallas")
                return render_flat_bvh_sorted(
                    scene, cam, width=W, height=H, spp=spp,
                    max_depth=DEPTH, seed=seed)

            # uniform-at-cap baseline (the estimator family adaptive uses)
            jax.block_until_ready(uniform(spp_cap))  # compile
            t0 = time.perf_counter()
            img_u = jax.block_until_ready(uniform(spp_cap))
            dt_u = time.perf_counter() - t0
            rmse_u = rmse(img_u, ref)

            for tol in (0.02, 0.05, 0.1):
                cfg = RenderConfig(width=W, height=H, spp=spp_cap,
                                   max_depth=DEPTH, progress=False, seed=5)
                render_adaptive(scene, cam, cfg, tol=tol, min_spp=8)  # warm
                t0 = time.perf_counter()
                img_a, stats = render_adaptive(
                    scene, cam, cfg, tol=tol, min_spp=8, return_stats=True)
                dt_a = time.perf_counter() - t0
                flat_a = np.asarray(img_a)[::-1].reshape(-1, 3)
                # uniform at EQUAL TIME: spp scaled by the wall ratio
                eq_spp = max(8, min(spp_cap, int(round(
                    spp_cap * dt_a / max(dt_u, 1e-9)))))
                img_e = jax.block_until_ready(uniform(eq_spp))
                _record(tier="adaptive", scene=name, tol=tol,
                        spp_cap=spp_cap,
                        uniform_s=round(dt_u, 3),
                        adaptive_s=round(dt_a, 3),
                        speedup=round(dt_u / dt_a, 2),
                        samples_saved_pct=round(100 * stats["savings"], 1),
                        rmse_uniform_cap=round(rmse_u, 5),
                        rmse_adaptive=round(rmse(flat_a, ref), 5),
                        equal_time_uniform_spp=eq_spp,
                        rmse_uniform_equal_time=round(rmse(img_e, ref), 5))
        except Exception as e:
            _record(tier="adaptive", scene=name, ok=False, error=repr(e))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default="all",
                    choices=["meshgrad", "mesh", "spectral", "adaptive",
                             "all"])
    ap.add_argument("--bf16", action="store_true",
                    help="also measure the (measured-loser) bf16 leaf tier")
    args = ap.parse_args()
    tiers = (["meshgrad", "mesh", "spectral", "adaptive"]
             if args.tier == "all" else [args.tier])
    for t in tiers:
        {"meshgrad": tier_meshgrad, "mesh": tier_mesh,
         "spectral": tier_spectral, "adaptive": tier_adaptive}[t]()


if __name__ == "__main__":
    main()
