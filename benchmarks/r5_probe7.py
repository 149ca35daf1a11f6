"""Round-5 probe 7: SBVH (spatial splits) vs plain SAH on the bunny tier."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    import jax
    import numpy as np

    from spira_tpu.accel.bvh import build_sbvh_for_triangles
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

    for alpha in (1e-5, 1e-6):
        t0 = time.perf_counter()
        bvh = build_sbvh_for_triangles(scene2.triangles, leaf_size=8,
                                       alpha=alpha)
        sc = attach_packed(replace(scene2, bvh=bvh, packed=None))
        refs = int(bvh.prim_idx.shape[0])
        print(f"[sbvh alpha={alpha} build {time.perf_counter()-t0:.1f}s "
              f"refs={refs} (+{100*(refs/72960-1):.1f}%) "
              f"pairs={sc.packed.n_pairs} depth={sc.packed.depth}]",
              flush=True)
        kw = dict(width=W, height=H, spp=SPP, max_depth=DEPTH)
        tc = time.perf_counter()
        out = jax.block_until_ready(
            render_flat_bvh_megakernel(sc, cam, seed=0, **kw))
        print(f"  [compile+warm {time.perf_counter()-tc:.1f}s]", flush=True)
        t0 = time.perf_counter()
        for i in range(3):
            out = render_flat_bvh_megakernel(sc, cam, seed=i + 1, **kw)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 3
        print(f"bunny SBVH alpha={alpha}: {rays/dt/1e6:.1f} Mrays/s "
              f"mean={float(np.asarray(out).mean()):.6f}", flush=True)
        if alpha == 1e-5:
            _, ctr = render_bvh_with_counters(
                sc, cam, width=W, height=H, spp=SPP, max_depth=DEPTH)
            print(f"bunny SBVH counters: {ctr}", flush=True)


if __name__ == "__main__":
    main()
