"""Round-5 probe 8: quad records (BVH2->BVH4) vs pair records on-chip."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    import jax
    import numpy as np

    from spira_tpu.accel.bvh import build_two_level
    from spira_tpu.accel.pairs import attach_packed, pack_bvh
    from spira_tpu.core.types import replace
    from spira_tpu.kernels.bvh_megakernel import (
        render_bvh_with_counters,
        render_flat_bvh_megakernel,
    )
    from spira_tpu.scene.bunny import bunny_camera, create_bunny_scene
    from spira_tpu.scene.camera import make_camera
    from spira_tpu.scene.scene import create_mesh_scene

    W, H, SPP, DEPTH = 640, 360, 16, 4
    rays = W * H * SPP * DEPTH

    def bench(scene, cam, label, iters=3, **kw):
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
        print(f"{label}: {rays / dt / 1e6:.1f} Mrays/s "
              f"mean={float(np.asarray(out).mean()):.6f}", flush=True)

    scene, _ = create_bunny_scene(leaf_size=8, allow_download=False)
    cam = bunny_camera(W / H)
    q = replace(scene, packed=pack_bvh(scene.bvh, scene.triangles,
                                       fanout=4))
    print(f"[bunny quads: {q.packed.pairs.shape} depth={q.packed.depth}]",
          flush=True)
    for K in (8, 4):
        bench(q, cam, f"bunny QUAD K={K}", pops_per_iter=K)
    _, ctr = render_bvh_with_counters(
        q, cam, width=W, height=H, spp=SPP, max_depth=DEPTH)
    print(f"bunny QUAD counters: {ctr}", flush=True)

    s = create_mesh_scene(subdivisions=4)
    bvh, tris = build_two_level([s.triangles], leaf_size=8)
    s = replace(s, triangles=tris, bvh=bvh, packed=None)
    sq = replace(s, packed=pack_bvh(bvh, tris, fanout=4))
    cam2 = make_camera(lookfrom=(0.0, 1.0, 3.0), lookat=(0.0, 0.0, 0.0),
                       aspect_ratio=W / H)
    bench(sq, cam2, "mesh5440 QUAD K=8", pops_per_iter=8)
    s16 = replace(s, packed=pack_bvh(bvh, tris, fanout=4))
    m16 = attach_packed(create_mesh_scene(subdivisions=3), fanout=4)
    bench(m16, cam2, "mesh1600 QUAD auto")


if __name__ == "__main__":
    main()
