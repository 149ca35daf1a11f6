"""Round-5 probe 3: leaf-size re-sweep under mixed ordering + counters +
mesh1600 regression check (one serial TPU session)."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    import jax
    import numpy as np

    from spira_tpu.kernels.bvh_megakernel import (
        render_bvh_with_counters,
        render_flat_bvh_megakernel,
    )
    from spira_tpu.scene.bunny import bunny_camera, create_bunny_scene
    from spira_tpu.scene.camera import make_camera
    from spira_tpu.scene.scene import create_mesh_scene
    from spira_tpu.accel.bvh import build_two_level
    from spira_tpu.accel.pairs import attach_packed
    from spira_tpu.core.types import replace

    W, H, SPP, DEPTH = 640, 360, 16, 4
    rays = W * H * SPP * DEPTH

    def bench(scene, cam, iters=3, **kw):
        kw = dict(width=W, height=H, spp=SPP, max_depth=DEPTH, **kw)
        tc = time.perf_counter()
        out = jax.block_until_ready(
            render_flat_bvh_megakernel(scene, cam, seed=0, **kw))
        print(f"  [compile+warm {time.perf_counter() - tc:.1f}s]",
              flush=True)
        t0 = time.perf_counter()
        for i in range(iters):
            out = render_flat_bvh_megakernel(scene, cam, seed=i + 1, **kw)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        assert np.isfinite(np.asarray(out)).all()
        return rays / dt / 1e6, float(np.asarray(out).mean())

    # mesh1600 regression check: dir vs mixed
    m16 = attach_packed(create_mesh_scene(subdivisions=3))
    cam16 = make_camera(lookfrom=(0.0, 1.0, 3.0), lookat=(0.0, 0.0, 0.0),
                        aspect_ratio=W / H)
    for order in ("dir", "mixed"):
        mrps, mean = bench(m16, cam16, descent_order=order)
        print(f"mesh1600 {order}: {mrps:.1f} Mrays/s mean={mean:.6f}",
              flush=True)

    # bunny leaf-size re-sweep under mixed
    for leaf in (4, 8):
        scene, _ = create_bunny_scene(leaf_size=leaf, allow_download=False)
        cam = bunny_camera(W / H)
        mrps, mean = bench(scene, cam)
        print(f"bunny leaf={leaf} mixed: {mrps:.1f} Mrays/s mean={mean:.6f}",
              flush=True)
        if leaf == 8:
            for order in ("dir", "mixed"):
                _, ctr = render_bvh_with_counters(
                    scene, cam, width=W, height=H, spp=SPP,
                    max_depth=DEPTH, descent_order=order)
                ctr["leaf_visits_secondary"] = (
                    ctr["leaf_visits"] - ctr["leaf_visits_primary"])
                print(f"bunny leaf=8 {order} counters: {ctr}", flush=True)

    # mesh5440 counters under mixed (sol ingredients)
    s = create_mesh_scene(subdivisions=4)
    bvh, tris = build_two_level([s.triangles], leaf_size=8)
    s = attach_packed(replace(s, triangles=tris, bvh=bvh, packed=None))
    _, ctr = render_bvh_with_counters(
        s, cam16, width=W, height=H, spp=SPP, max_depth=DEPTH)
    ctr["leaf_visits_secondary"] = (
        ctr["leaf_visits"] - ctr["leaf_visits_primary"])
    print(f"mesh5440 mixed counters: {ctr}", flush=True)


if __name__ == "__main__":
    main()
