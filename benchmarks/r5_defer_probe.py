"""Round-5 probe: deferred-leaf + divergence-aware descent on real hardware.

Measures the bunny tier (and optionally 5.4k) at the flagship config across
{baseline, defer, mixed, defer+mixed}, plus one counters pass per variant to
report the bounce-resolved leaf-visit split and (defer) culled re-tests.

Usage: python benchmarks/r5_defer_probe.py [--tier bunny|mesh|both]
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default="bunny")
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--no-counters", action="store_true")
    ap.add_argument("--variants", default="")
    args = ap.parse_args()

    import jax
    import numpy as np

    from spira_tpu.accel.bvh import build_two_level
    from spira_tpu.accel.pairs import attach_packed
    from spira_tpu.core.types import replace
    from spira_tpu.kernels.bvh_megakernel import (
        render_bvh_with_counters,
        render_flat_bvh_megakernel,
    )
    from spira_tpu.scene.bunny import bunny_camera, create_bunny_scene
    from spira_tpu.scene.camera import make_camera
    from spira_tpu.scene.scene import create_mesh_scene

    W, H, SPP, DEPTH = 640, 360, args.spp, 4
    rays = W * H * SPP * DEPTH

    def bench(scene, cam, iters=3, **kw):
        kw.setdefault("tile_h", 32)
        kw = dict(width=W, height=H, spp=SPP, max_depth=DEPTH, **kw)
        tc = time.perf_counter()
        out = jax.block_until_ready(
            render_flat_bvh_megakernel(scene, cam, seed=0, **kw))
        print(f"  [compile+warm {time.perf_counter() - tc:.1f}s]", flush=True)
        t0 = time.perf_counter()
        for i in range(iters):
            out = render_flat_bvh_megakernel(scene, cam, seed=i + 1, **kw)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        assert np.isfinite(np.asarray(out)).all()
        return rays / dt / 1e6, float(np.asarray(out).mean())

    tiers = []
    tb = time.perf_counter()
    if args.tier in ("bunny", "both"):
        scene, _ = create_bunny_scene(leaf_size=8, allow_download=False)
        tiers.append(("bunny", scene, bunny_camera(W / H)))
        print(f"[bunny scene build {time.perf_counter() - tb:.1f}s]", flush=True)
    if args.tier in ("mesh", "both"):
        s = create_mesh_scene(subdivisions=4)
        bvh, tris = build_two_level([s.triangles], leaf_size=8)
        s = replace(s, triangles=tris, bvh=bvh, packed=None)
        tiers.append(("mesh5440", attach_packed(s),
                      make_camera(lookfrom=(0.0, 1.0, 3.0),
                                  lookat=(0.0, 0.0, 0.0),
                                  aspect_ratio=W / H)))

    all_variants = {
        "baseline": {},
        "mixed": dict(descent_order="mixed"),
        "dist": dict(descent_order="dist"),
        "defer": dict(defer_leaves=True),
        "defer+mixed": dict(defer_leaves=True, descent_order="mixed"),
        "mixed+t64": dict(descent_order="mixed", tile_h=64),
        "mixed+k8": dict(descent_order="mixed", pops_per_iter=8),
        "bounce": dict(descent_order="bounce"),
        "mixed4": dict(descent_order="mixed4"),
        "mixed+t16": dict(descent_order="mixed", tile_h=16),
        "mixed+t16k8": dict(descent_order="mixed", tile_h=16,
                            pops_per_iter=8),
        "mixed+k24": dict(descent_order="mixed", pops_per_iter=24),
        "mixed+k32": dict(descent_order="mixed", pops_per_iter=32),
        "mixed+t16k32": dict(descent_order="mixed", tile_h=16,
                             pops_per_iter=32),
    }
    names = (args.variants.split(",") if args.variants
             else ["baseline", "mixed", "defer", "defer+mixed"])
    variants = [(n, all_variants[n]) for n in names]
    for name, scene, cam in tiers:
        for vname, kw in variants:
            try:
                mrps, mean = bench(scene, cam, **kw)
                print(f"{name} {vname}: {mrps:.1f} Mrays/s mean={mean:.6f}",
                      flush=True)
            except Exception as e:
                print(f"{name} {vname}: FAILED {e!r}", flush=True)
        if args.no_counters:
            continue
        for vname, kw in variants:
            try:
                ckw = dict(kw); ckw.pop("pops_per_iter", None)
                _, ctr = render_bvh_with_counters(
                    scene, cam, width=W, height=H, spp=SPP,
                    max_depth=DEPTH, tile_h=ckw.pop("tile_h", 32), **ckw)
                ctr["leaf_visits_secondary"] = (
                    ctr["leaf_visits"] - ctr["leaf_visits_primary"])
                print(f"{name} {vname} counters: {ctr}", flush=True)
            except Exception as e:
                print(f"{name} {vname} counters: FAILED {e!r}", flush=True)


if __name__ == "__main__":
    main()
