"""Packet-BVH parameter sweep on real hardware (mesh-throughput tuning).

Sweeps (tile_h, leaf_size, pops_per_iter) on the 5.4k-tri tier and the
73k-tri bunny tier at the flagship config (640x360 spp16 d4) and prints
Mrays/s per point.  Compiles are cached per static-arg set, so keep the
grid small — each new point costs a remote-compile round trip (~30-120 s
on the axon tunnel).

Usage:  python benchmarks/mesh_sweep.py [--quick]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="one warm point per scene (sanity/regression)")
    ap.add_argument("--spp", type=int, default=16)
    args = ap.parse_args()

    import jax
    import numpy as np

    from spira_tpu.accel.bvh import build_two_level
    from spira_tpu.accel.pairs import attach_packed, pack_bvh
    from spira_tpu.kernels.bvh_megakernel import render_flat_bvh_megakernel
    from spira_tpu.scene.bunny import bunny_camera, create_bunny_scene
    from spira_tpu.scene.camera import make_camera
    from spira_tpu.scene.scene import create_mesh_scene

    W, H, SPP, DEPTH = 640, 360, args.spp, 4
    rays = W * H * SPP * DEPTH

    def bench(scene, cam, tile_h, pops, iters=5):
        kw = dict(width=W, height=H, spp=SPP, max_depth=DEPTH,
                  tile_h=tile_h, pops_per_iter=pops)
        out = jax.block_until_ready(
            render_flat_bvh_megakernel(scene, cam, seed=0, **kw))
        t0 = time.perf_counter()
        for i in range(iters):
            out = render_flat_bvh_megakernel(scene, cam, seed=i + 1, **kw)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        assert np.isfinite(np.asarray(out)).all()
        return rays / dt / 1e6

    def rebuild_leaf(scene_fn, leaf):
        scene, info = scene_fn(leaf)
        return scene, info

    def mesh_scene(leaf):
        from spira_tpu.core.types import replace

        s = create_mesh_scene(subdivisions=4)  # 5440 tris (the 5.4k tier)
        bvh, tris = build_two_level([s.triangles], leaf_size=leaf)
        s = replace(s, triangles=tris, bvh=bvh, packed=None)
        return attach_packed(s), dict(triangles=int(tris.count))

    def bunny_scene(leaf):
        return create_bunny_scene(leaf_size=leaf, allow_download=False)

    cam_mesh = make_camera(lookfrom=(0.0, 1.0, 3.0), lookat=(0.0, 0.0, 0.0),
                           aspect_ratio=W / H)
    cam_bunny = bunny_camera(W / H)

    tiers = [("5.4k", mesh_scene, cam_mesh), ("bunny", bunny_scene, cam_bunny)]
    if args.quick:
        grid = [(32, 16, 8)]
    else:
        grid = [
            (32, 8, 16),   # round-4 tuned point (baseline)
            (32, 4, 16),
            (32, 16, 16),
            (64, 8, 16),
            (32, 8, 8),
        ]

    for name, scene_fn, cam in tiers:
        for tile_h, leaf, pops in grid:
            try:
                scene, info = rebuild_leaf(scene_fn, leaf)
                mrps = bench(scene, cam, tile_h, pops)
                print(f"{name} tris={info['triangles']} tile_h={tile_h} "
                      f"leaf={leaf} pops={pops}: {mrps:.1f} Mrays/s",
                      flush=True)
            except Exception as e:
                print(f"{name} tile_h={tile_h} leaf={leaf} pops={pops}: "
                      f"FAILED {e!r}", flush=True)


if __name__ == "__main__":
    main()
