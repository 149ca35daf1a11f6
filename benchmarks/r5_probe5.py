"""Round-5 probe 5: mono flat-SAH bunny tree vs the two-level tree.

The procedural bunny's 9 anatomical parts interpenetrate, so the
two-level BVH's top-level boxes overlap and packets descend multiple
subtrees.  A single binned-SAH tree over all 72,960 triangles can split
across part boundaries and should cut leaf visits.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    import jax
    import numpy as np

    from spira_tpu.accel.bvh import build_bvh_for_triangles, build_two_level
    from spira_tpu.accel.pairs import attach_packed
    from spira_tpu.core.types import replace
    from spira_tpu.kernels.bvh_megakernel import (
        render_bvh_with_counters,
        render_flat_bvh_megakernel,
    )
    from spira_tpu.scene.bunny import bunny_camera, create_bunny_scene

    W, H, SPP, DEPTH = 640, 360, 16, 4
    rays = W * H * SPP * DEPTH

    scene2, _ = create_bunny_scene(leaf_size=8, allow_download=False)
    cam = bunny_camera(W / H)

    def bench(scene, label, iters=3, **kw):
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
        return dt

    # mono flat-SAH tree over the same triangles, several leaf sizes
    for leaf in (8, 16):
        t0 = time.perf_counter()
        bvh = build_bvh_for_triangles(scene2.triangles, leaf_size=leaf)
        mono = attach_packed(replace(scene2, bvh=bvh, packed=None))
        print(f"[mono leaf={leaf} build {time.perf_counter() - t0:.1f}s "
              f"pairs={mono.packed.n_pairs} depth={mono.packed.depth}]",
              flush=True)
        bench(mono, f"bunny MONO leaf={leaf} mixed")
        if leaf == 8:
            _, ctr = render_bvh_with_counters(
                mono, cam, width=W, height=H, spp=SPP, max_depth=DEPTH)
            ctr["leaf_visits_secondary"] = (
                ctr["leaf_visits"] - ctr["leaf_visits_primary"])
            print(f"bunny MONO leaf=8 counters: {ctr}", flush=True)

    bench(scene2, "bunny two-level leaf=8 mixed (control)")


if __name__ == "__main__":
    main()
