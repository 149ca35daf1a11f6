"""Round-5 engine battery on real hardware (one TPU chip), single pass.

Measures the round-5 deliverables (VERDICT r4 "next round" items):

* ``mesh``       — packet-engine tiers with the round-5 traversal config,
  each row annotated with ``sol_pct`` — % of the arithmetic speed-of-light
  bound achieved (``spira_tpu/utils/sol.py``; VERDICT item 2) from a
  counters pass.
* ``meshgrad``   — the differentiable mesh step at grad_spp=2 (round-over-
  round) AND at EXACT REPLAY (grad_spp == spp == 16; VERDICT item 4 —
  the unbiased full-replay backward, previously never measured).
* ``spectral``   — spectral packet tiers + Cornell showcase + spectral
  mesh gradients at 1.3k (round-over-round) and at BUNNY scale (73k tris;
  VERDICT item 4).
* ``adaptive``   — the round-5 BLOCK-granularity sampler: tol sweep whose
  columns actually vary (VERDICT item 5), plus one spectral adaptive row.
* ``real_mesh``  — a real artist mesh row (VERDICT item 7): the Stanford
  bunny if the bench host has egress, else the vendored
  ``assets/trefoil.obj``.

Every hardware call runs under bounded retries with backoff (VERDICT item
9 — Mosaic remote-compile 500s / tunnel flakes), and the battery ends with
one ``battery_clean`` summary row: true iff every tier row landed without
a retry exhausting or an error row.

Results append as JSON lines to ``benchmarks/round5_timings.jsonl``.

Usage: python benchmarks/round5_timings.py [--tier ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W, H, SPP, DEPTH = 640, 360, 16, 4

_OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "round5_timings.jsonl")

_FAILED_ROWS = 0
_RETRIES_USED = 0


def _record(**kw):
    import jax

    kw.setdefault("backend", jax.default_backend())
    kw.setdefault("ts", time.strftime("%Y-%m-%dT%H:%M:%S"))
    with open(_OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def _fail(**kw):
    global _FAILED_ROWS
    _FAILED_ROWS += 1
    _record(ok=False, **kw)


def _retry(fn, attempts=3, backoff_s=20.0, label=""):
    """Bounded retries with backoff for flaky remote compiles (VERDICT r4
    item 9: the round-4 battery was stitched from >=4 partial re-runs)."""
    global _RETRIES_USED
    last = None
    for a in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — log + retry is the point
            last = e
            _RETRIES_USED += 1
            print(f"[retry {a + 1}/{attempts}] {label}: {e!r}", flush=True)
            traceback.print_exc()
            time.sleep(backoff_s * (a + 1))
    raise last


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


# Round-5 traversal config per tier — set from benchmarks/r5_defer_probe.py
# measurements (defaults to the round-4 tuned point when the probe found
# no winner; see ARCHITECTURE.md round-5 section).
MESH_KW = {}


def tier_mesh():
    """Packet-engine mesh tiers + speed-of-light annotation (VERDICT
    items 1+2: the bars are >=50 Mrays/s @5.4k and >=30 @73k, each row
    carrying % of its arithmetic bound)."""
    from spira_tpu.kernels.bvh_megakernel import (
        render_bvh_with_counters,
        render_flat_bvh_megakernel,
    )
    from spira_tpu.utils import sol

    rays = W * H * SPP * DEPTH
    kw = dict(width=W, height=H, spp=SPP, max_depth=DEPTH, **MESH_KW)
    for name, scene_fn in [("mesh1600", lambda: _mesh_scene(3)),
                           ("mesh5440", lambda: _mesh_scene(4)),
                           ("bunny", _bunny_scene)]:
        try:
            scene, cam, ntris = _retry(scene_fn, label=f"scene {name}")
        except Exception as e:
            _fail(tier="mesh", scene=name, error=repr(e))
            continue
        n_pairs = scene.packed.pairs.shape[0]
        pops = 16 if n_pairs >= 4096 else (8 if n_pairs >= 512 else 1)
        try:
            dt, compile_s = _retry(
                lambda: _time(lambda i: render_flat_bvh_megakernel(
                    scene, cam, **kw, seed=i), 5),
                label=f"mesh {name}")
            # counters pass -> arithmetic speed-of-light bound
            _, ctr = _retry(
                lambda: render_bvh_with_counters(
                    scene, cam, **kw, seed=1),
                label=f"counters {name}")
            bound = sol.vpu_lower_bound_seconds(
                ctr, tile_h=kw.get("tile_h", 32), pops_per_iter=pops,
                rows_per_visit=-(-scene.packed.max_leaf // 8),
                form=getattr(scene.packed, "form", "bw"),
            )
            _record(tier="mesh", scene=name, tris=ntris,
                    engine="pallas_bvh", leaf_precision="fp32",
                    mrays_s=round(rays / dt / 1e6, 1),
                    run_ms=round(dt * 1e3, 1),
                    compile_s=round(compile_s, 1),
                    sol_bound_ms=round(bound["bound_s"] * 1e3, 1),
                    sol_pct=round(sol.sol_pct(bound["bound_s"], dt), 1),
                    leaf_visits=ctr["leaf_visits"],
                    leaf_visits_primary=ctr["leaf_visits_primary"],
                    pop_batches=ctr["pop_batches"],
                    **{k: v for k, v in MESH_KW.items()})
        except Exception as e:
            _fail(tier="mesh", scene=name, tris=ntris,
                  engine="pallas_bvh", error=repr(e))


def tier_meshgrad():
    """Differentiable MESH step: packet-BVH Pallas forward + packet-hook
    backward — at grad_spp=2 (round-over-round) and at EXACT REPLAY
    (grad_spp=spp; the unbiased full backward, VERDICT item 4)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spira_tpu.render import render_flat_hybrid_grad_mesh

    rays = W * H * SPP * DEPTH
    kw = dict(width=W, height=H, spp=SPP, max_depth=DEPTH)
    for tier_name, scene_fn in [("mesh1600", lambda: _mesh_scene(3)),
                                ("bunny", _bunny_scene)]:
        try:
            scene, cam, ntris = _retry(scene_fn, label=f"scene {tier_name}")
        except Exception as e:
            _fail(tier="meshgrad", scene=tier_name, error=repr(e))
            continue
        a0 = scene.materials.albedo
        for grad_spp in (2, SPP):
            @jax.jit
            def step(albedo, seed, _scene=scene, _cam=cam, _g=grad_spp):
                from spira_tpu.core.types import replace

                def loss_fn(a):
                    sc = replace(_scene, materials=replace(
                        _scene.materials, albedo=a))
                    img = render_flat_hybrid_grad_mesh(
                        sc, _cam, **kw, seed=seed, grad_spp=_g)
                    return jnp.mean(img)

                return jax.value_and_grad(loss_fn)(albedo)

            try:
                dt, compile_s = _retry(
                    lambda s=step: _time(
                        lambda i: s(a0, jnp.int32(i))[1], 3),
                    label=f"meshgrad {tier_name} g{grad_spp}")
                loss, grad = jax.block_until_ready(step(a0, jnp.int32(0)))
                loss = float(loss)
                g = np.asarray(grad)
                _record(tier="meshgrad", scene=tier_name, tris=ntris,
                        engine="hybrid_mesh fwd-pallas_bvh/bwd-packet_hook",
                        fwd_bwd_mrays_s=round(rays / dt / 1e6, 1),
                        grad_spp=grad_spp,
                        exact_replay=bool(grad_spp == SPP),
                        run_ms=round(dt * 1e3, 1),
                        compile_s=round(compile_s, 1),
                        loss=round(loss, 6),
                        loss_finite=bool(np.isfinite(loss)),
                        grad_finite=bool(np.isfinite(g).all()),
                        grad_max=round(float(np.abs(g).max()), 6))
            except Exception as e:
                _fail(tier="meshgrad", scene=tier_name, tris=ntris,
                      grad_spp=grad_spp, engine="hybrid_mesh",
                      error=repr(e))


def _spectral_mesh_scene(subdivisions=4):
    """A mesh under spectral materials (dispersive glass sphere, emissive
    light) — same construction as the round-3/4 spectral tier."""
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


def _spectral_bunny_scene():
    """Bunny-scale SPECTRAL gradient scene: the procedural bunny under its
    default materials (albedo SPDs derive from RGB via Smits)."""
    from spira_tpu.scene.bunny import bunny_camera, create_bunny_scene

    scene, info = create_bunny_scene(allow_download=False)
    return scene, bunny_camera(W / H), int(info["triangles"])


def _spectral_grad_row(scene_fn, name):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spira_tpu.render import render_flat_hybrid_grad_mesh

    rays = W * H * SPP * DEPTH
    kw = dict(width=W, height=H, spp=SPP, max_depth=DEPTH)
    try:
        scene, cam, ntris = _retry(scene_fn, label=f"scene {name}")

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
        dt, compile_s = _retry(
            lambda: _time(lambda i: step(s0, jnp.int32(i))[1], 3),
            label=f"spectralgrad {name}")
        loss, grad = jax.block_until_ready(step(s0, jnp.int32(0)))
        g = np.asarray(grad)
        _record(tier="spectralgrad", scene=name, tris=ntris,
                engine="hybrid_mesh_spectral fwd-pallas/bwd-packet_hook",
                fwd_bwd_mrays_s=round(rays / dt / 1e6, 1), grad_spp=2,
                run_ms=round(dt * 1e3, 1), compile_s=round(compile_s, 1),
                loss=round(float(loss), 6),
                loss_finite=bool(np.isfinite(float(loss))),
                grad_finite=bool(np.isfinite(g).all()),
                grad_max=round(float(np.abs(g).max()), 6))
    except Exception as e:
        _fail(tier="spectralgrad", scene=name, error=repr(e))


def tier_spectral():
    """Spectral engines: packet tiers, the Cornell showcase, and spectral
    mesh gradients at 1.3k AND bunny scale (VERDICT item 4)."""
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
            scene, cam, ntris = _retry(scene_fn, label=f"scene {name}")
            dt, compile_s = _retry(
                lambda: _time(
                    lambda i: render_flat_spectral_bvh_megakernel(
                        scene, cam, **kw, seed=i), 5),
                label=f"spectral {name}")
            _record(tier="spectral", scene=name, tris=ntris,
                    engine="pallas_spectral_bvh",
                    mrays_s=round(rays / dt / 1e6, 1),
                    run_ms=round(dt * 1e3, 1),
                    compile_s=round(compile_s, 1))
        except Exception as e:
            _fail(tier="spectral", scene=name,
                  engine="pallas_spectral_bvh", error=repr(e))

    # spectral mesh gradients: round-over-round 1.3k row + a 5.1k row.
    # The bunny-scale (73k) spectral gradient is a SEPARATE tier
    # (--tier spectralgrad_bunny): its backward compile ran >16 min in the
    # single-pass battery (XLA backward of a 73k-leaf spectral wavefront)
    # and needs its own watchdog budget.
    _spectral_grad_row(lambda: _spectral_mesh_scene(3), "spectral_mesh1280")
    _spectral_grad_row(lambda: _spectral_mesh_scene(4), "spectral_mesh5120_grad")

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
        dt, compile_s = _retry(
            lambda: _time(lambda i: render_flat_spectral_megakernel(
                cscene, ccam, **ckw, seed=i), 3),
            label="cornell")
        _record(tier="spectral", scene="cornell512_spp128",
                engine="pallas_spectral", s_per_frame=round(dt, 3),
                grays_s=round(crays / dt / 1e9, 2),
                compile_s=round(compile_s, 1))
    except Exception as e:
        _fail(tier="spectral", scene="cornell512_spp128",
              engine="pallas_spectral", error=repr(e))


def tier_adaptive():
    """Round-5 adaptive: BLOCK granularity with the block-mean statistic —
    the tol sweep whose columns actually vary (VERDICT item 5) — plus one
    spectral adaptive row."""
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
    scenes.append(("demo_spheres", sph, st.default_camera(W / H), "pallas",
                   False))
    mscene, mcam, _ = _mesh_scene(4)
    scenes.append(("mesh5440", mscene, mcam, "bvh_sorted", False))
    sscene, scam, _ = _spectral_mesh_scene(4)
    scenes.append(("spectral_mesh5120", sscene, scam, "spectral", True))

    for name, scene, cam, engine, spectral in scenes:
        try:
            # high-spp ground truth (uniform, fast engine, one-off)
            def _ref():
                if engine == "pallas":
                    e = "pallas"
                elif engine == "spectral":
                    e = "pallas_spectral_bvh"
                else:
                    e = "pallas_bvh"
                return render_flat_engine(
                    scene, cam, width=W, height=H, spp=512,
                    max_depth=DEPTH, seed=999, engine=e,
                    spectral=spectral)

            ref = _retry(lambda: jax.block_until_ready(_ref()),
                         label=f"adaptive ref {name}")

            def uniform(spp, seed=5):
                if engine == "pallas":
                    return render_flat_engine(
                        scene, cam, width=W, height=H, spp=spp,
                        max_depth=DEPTH, seed=seed, engine="pallas")
                if engine == "spectral":
                    return render_flat_engine(
                        scene, cam, width=W, height=H, spp=spp,
                        max_depth=DEPTH, seed=seed,
                        engine="pallas_spectral_bvh", spectral=True)
                return render_flat_bvh_sorted(
                    scene, cam, width=W, height=H, spp=spp,
                    max_depth=DEPTH, seed=seed)

            jax.block_until_ready(uniform(spp_cap))  # compile
            t0 = time.perf_counter()
            img_u = jax.block_until_ready(uniform(spp_cap))
            dt_u = time.perf_counter() - t0
            rmse_u = rmse(img_u, ref)

            for tol in (0.02, 0.05, 0.1):
                cfg = RenderConfig(width=W, height=H, spp=spp_cap,
                                   max_depth=DEPTH, progress=False, seed=5,
                                   spectral=spectral)
                render_adaptive(scene, cam, cfg, tol=tol, min_spp=8,
                                granularity="block")  # warm
                t0 = time.perf_counter()
                img_a, stats = render_adaptive(
                    scene, cam, cfg, tol=tol, min_spp=8,
                    granularity="block", return_stats=True)
                dt_a = time.perf_counter() - t0
                flat_a = np.asarray(img_a)[::-1].reshape(-1, 3)
                eq_spp = max(8, min(spp_cap, int(round(
                    spp_cap * dt_a / max(dt_u, 1e-9)))))
                img_e = jax.block_until_ready(uniform(eq_spp))
                _record(tier="adaptive", scene=name, tol=tol,
                        spp_cap=spp_cap, granularity="block",
                        statistic="mean",
                        uniform_s=round(dt_u, 3),
                        adaptive_s=round(dt_a, 3),
                        speedup=round(dt_u / dt_a, 2),
                        samples_saved_pct=round(100 * stats["savings"], 1),
                        rmse_uniform_cap=round(rmse_u, 5),
                        rmse_adaptive=round(rmse(flat_a, ref), 5),
                        equal_time_uniform_spp=eq_spp,
                        rmse_uniform_equal_time=round(rmse(img_e, ref), 5))
        except Exception as e:
            _fail(tier="adaptive", scene=name, error=repr(e))


def tier_real_mesh():
    """A REAL artist mesh row (VERDICT item 7): Stanford bunny if this
    host has egress, else the vendored trefoil knot OBJ (2.3k tris) —
    either way the first throughput number in the repo measured on a real
    OBJ, not a procedural generator."""
    from spira_tpu.kernels.bvh_megakernel import render_flat_bvh_megakernel
    from spira_tpu.scene.bunny import bunny_camera, download_bunny
    from spira_tpu.scene.camera import make_camera
    from spira_tpu.scene.scene import create_mesh_scene
    from spira_tpu.accel.pairs import attach_packed

    rays = W * H * SPP * DEPTH
    kw = dict(width=W, height=H, spp=SPP, max_depth=DEPTH, **MESH_KW)

    rows = []
    path = download_bunny()
    if path is not None:
        rows.append(("stanford_bunny_obj", path,
                     dict(lookfrom=(0.0, 0.8, 2.6), lookat=(0.0, 0.1, 0.0))))
    trefoil = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "assets", "trefoil.obj")
    rows.append(("trefoil_obj", trefoil,
                 dict(lookfrom=(0.0, 1.0, 3.0), lookat=(0.0, 0.0, 0.0))))

    for name, obj_path, camkw in rows:
        try:
            scene = _retry(
                lambda: attach_packed(create_mesh_scene(obj_path=obj_path)),
                label=f"scene {name}")
            cam = make_camera(aspect_ratio=W / H, **camkw)
            ntris = int(scene.triangles.count)
            dt, compile_s = _retry(
                lambda: _time(lambda i: render_flat_bvh_megakernel(
                    scene, cam, **kw, seed=i), 5),
                label=f"real_mesh {name}")
            _record(tier="real_mesh", scene=name, tris=ntris,
                    engine="pallas_bvh",
                    mrays_s=round(rays / dt / 1e6, 1),
                    run_ms=round(dt * 1e3, 1),
                    compile_s=round(compile_s, 1),
                    source="downloaded" if name.startswith("stanford")
                    else "vendored")
        except Exception as e:
            _fail(tier="real_mesh", scene=name, error=repr(e))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default="all",
                    choices=["mesh", "meshgrad", "spectral", "adaptive",
                             "real_mesh", "spectralgrad_bunny", "all"])
    args = ap.parse_args()
    t0 = time.time()
    tiers = (["mesh", "meshgrad", "spectral", "adaptive", "real_mesh"]
             if args.tier == "all" else [args.tier])
    for t in tiers:
        {"mesh": tier_mesh, "meshgrad": tier_meshgrad,
         "spectral": tier_spectral, "adaptive": tier_adaptive,
         "real_mesh": tier_real_mesh,
         "spectralgrad_bunny": lambda: _spectral_grad_row(
             _spectral_bunny_scene, "spectral_bunny_grad")}[t]()
    _record(tier="summary",
            battery_clean=bool(_FAILED_ROWS == 0),
            failed_rows=_FAILED_ROWS,
            retries_used=_RETRIES_USED,
            tiers=tiers,
            wall_s=round(time.time() - t0, 1),
            single_pass=True)


if __name__ == "__main__":
    main()
