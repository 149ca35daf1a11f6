"""Host-side packet-traversal cost analytics (no chip needed).

Walks the REAL builder tree (FlatBVH) with the packet kernel's semantics —
any-hit slab tests over a (tile_h*128)-ray packet, nearest-hit culling from
actual leaf intersections — and counts the work the Pallas kernel would do:

* ``pops``       — pair-record visits (scalar stack pops),
* ``leaf_rows``  — 8-triangle VPU leaf rows tested (pairs engine),
* ``mxu_blocks`` — 128-triangle MXU superleaf visits (pallas_bvh_mxu),

as a function of the leaf/cut size.  With the round-2 measured per-op costs
(docs/ARCHITECTURE.md "Pallas packet traversal — measured cost model") this
ranks tree/leaf configurations BEFORE the chip is reachable: the counts are
exact, only the per-op constants come from measurement.

    python benchmarks/tree_stats.py [--scene mesh1600|mesh5440|bunny]
                                    [--cuts 8,16,32,64,128] [--tile-h 32]

Caveats: primary-bounce packets only (secondary bounces are less coherent,
so absolute numbers are optimistic; rankings across cuts have matched the
measured row-engine ordering at small cuts only directionally — trust the
large relative gaps, not the small ones).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W, H = 640, 360


def _scene(name):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from spira_tpu.scene.camera import make_camera

    if name == "bunny":
        from spira_tpu.scene.bunny import bunny_camera, create_bunny_scene

        scene, info = create_bunny_scene(allow_download=False)
        return scene, bunny_camera(W / H)
    sub = {"mesh1600": 3, "mesh5440": 4}[name]
    from spira_tpu.scene.scene import create_mesh_scene

    return (
        create_mesh_scene(subdivisions=sub),
        make_camera(lookfrom=(0.0, 1.0, 3.0), lookat=(0.0, 0.0, 0.0),
                    aspect_ratio=W / H),
    )


def _primary_packets(camera, tile_h):
    """Pinhole packet rays (tile_h rows x 128 cols per packet), jitter-free
    centers — coherence-faithful for primary bounces."""
    import jax
    from spira_tpu.scene.camera import generate_rays
    from spira_tpu.core import rng as srng

    key = srng.sample_key(srng.base_key(0), 0)
    o, d = generate_rays(camera, W, H, key)
    o = np.asarray(o, np.float64).reshape(H, W, 3)
    d = np.asarray(d, np.float64).reshape(H, W, 3)
    packets = []
    for y0 in range(0, H, tile_h):
        for x0 in range(0, W, 128):
            po = o[y0:y0 + tile_h, x0:x0 + 128].reshape(-1, 3)
            pd = d[y0:y0 + tile_h, x0:x0 + 128].reshape(-1, 3)
            packets.append((po, pd))
    return packets


def packet_walk(bvh, tris, po, pd, cut):
    """Walk the FlatBVH with packet any-hit semantics, contracting every
    subtree with <= ``cut`` triangles into one leaf (the superleaf/leaf-size
    knob).  Returns (pops, leaf_visits, leaf_tris_tested)."""
    node_min = np.asarray(bvh.node_min, np.float64)
    node_max = np.asarray(bvh.node_max, np.float64)
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    is_leaf = np.asarray(bvh.is_leaf)
    prim_idx = np.asarray(bvh.prim_idx)

    v0 = np.asarray(tris.v0, np.float64)
    e1 = np.asarray(tris.e1, np.float64)
    e2 = np.asarray(tris.e2, np.float64)

    # triangle count + gathered prim list per subtree (host-side, once)
    n_nodes = node_min.shape[0]
    tri_count = np.zeros(n_nodes, np.int64)
    order = list(range(n_nodes - 1, -1, -1))  # children follow parents
    prims_of = [None] * n_nodes
    for i in order:
        if is_leaf[i]:
            first, cnt = int(left[i]), int(right[i])
            tri_count[i] = cnt
            prims_of[i] = prim_idx[first:first + cnt]
        else:
            l, r = int(left[i]), int(right[i])
            kids = [l] if l == r else [l, r]
            tri_count[i] = sum(tri_count[k] for k in kids)
            prims_of[i] = np.concatenate([prims_of[k] for k in kids])

    inv = np.where(np.abs(pd) > 1e-12, 1.0 / pd, 1e12)
    best = np.full(po.shape[0], np.inf)

    pops = leaf_visits = leaf_tris = 0
    stack = [0]
    while stack:
        i = stack.pop()
        pops += 1
        lo = node_min[i][None, :]
        hi = node_max[i][None, :]
        t0 = (lo - po) * inv
        t1 = (hi - po) * inv
        tn = np.maximum(np.minimum(t0, t1).max(axis=1), 1e-3)
        tf = np.minimum(np.maximum(t0, t1).min(axis=1), best)
        if not (tn <= tf).any():
            continue
        if is_leaf[i] or tri_count[i] <= cut:
            prims = prims_of[i]
            leaf_visits += 1
            leaf_tris += len(prims)
            # vectorized Moller-Trumbore: (T, P) over the packet
            pv = np.cross(pd[None, :, :], e2[prims][:, None, :])
            det = np.einsum("tj,tpj->tp", e1[prims], pv)
            ok = np.abs(det) > 1e-12
            invdet = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
            tv = po[None, :, :] - v0[prims][:, None, :]
            u = np.einsum("tpj,tpj->tp", tv, pv) * invdet
            qv = np.cross(tv, e1[prims][:, None, :])
            t = np.einsum("tj,tpj->tp", e2[prims], qv) * invdet
            vv = np.einsum("pj,tpj->tp", pd, qv) * invdet
            hit = ok & (u >= 0) & (vv >= 0) & (u + vv <= 1) & (t > 1e-3)
            t = np.where(hit, t, np.inf)
            best = np.minimum(best, t.min(axis=0))
        else:
            l, r = int(left[i]), int(right[i])
            stack.extend([l] if l == r else [r, l])
    return pops, leaf_visits, leaf_tris


# Round-2 measured per-op costs (v5e, tile_h=32 packets of 4096 rays;
# docs/ARCHITECTURE.md).  t_pop covers the slab test + batched readback
# share; t_row the 8-tri VPU scalar-broadcast row; t_block the 128-tri
# MXU superleaf visit (throughput-bound ~5 us per 1024 rays -> ~20 us
# per 4096-ray packet, pipelined ~x2 better in situ; use 10 us).
T_POP_US = 1.1
T_ROW_US = 2.2
T_BLOCK_US = 10.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="mesh5440",
                    choices=["mesh1600", "mesh5440", "bunny"])
    ap.add_argument("--cuts", default="8,16,32,64,128")
    ap.add_argument("--tile-h", type=int, default=32)
    ap.add_argument("--max-packets", type=int, default=0,
                    help="subsample packets for speed (0 = all)")
    args = ap.parse_args()

    scene, cam = _scene(args.scene)
    packets = _primary_packets(cam, args.tile_h)
    if args.max_packets:
        packets = packets[:: max(1, len(packets) // args.max_packets)]
    bvh, tris = scene.bvh, scene.triangles

    print(f"# {args.scene}: {int(tris.count)} tris, {len(packets)} packets "
          f"({args.tile_h}x128 rays)", flush=True)
    for cut in [int(c) for c in args.cuts.split(",")]:
        t0 = time.perf_counter()
        P = L = T = 0
        for po, pd in packets:
            p, l, t = packet_walk(bvh, tris, po, pd, cut)
            P += p
            L += l
            T += t
        n = len(packets)
        # the kernel's leaf loop is a STATIC unroll of ceil(max_leaf/8)
        # row tests per visit — charge full rows per visit, not actual tris
        rows = L * (-(-cut // 8))
        est_vpu = (P * T_POP_US + rows * T_ROW_US) / n
        est_mxu = (P * T_POP_US + L * T_BLOCK_US) / n
        print(json.dumps(dict(
            scene=args.scene, cut=cut,
            pops_per_packet=round(P / n, 1),
            leaf_visits_per_packet=round(L / n, 1),
            leaf_tris_per_packet=round(T / n, 1),
            est_us_vpu_rows=round(est_vpu, 1),
            est_us_mxu_blocks=round(est_mxu, 1),
            walk_s=round(time.perf_counter() - t0, 1),
        )), flush=True)


if __name__ == "__main__":
    main()
