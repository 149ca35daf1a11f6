"""BASELINE config-5 scale proof: 1920x1080 spp=256, chunked + checkpointed.

Two modes, merged into one artifact (SCALING_r02.json at the repo root):

* ``--mode tpu``     — the full config-5 frame on the real chip via the
  progressive driver (spp-chunked, sample-granular checkpoints), recording
  wall time, rays/s and peak device memory.
* ``--mode virtual`` — the same program tile-sharded over an 8-device
  virtual CPU mesh (``xla_force_host_platform_device_count``), plus the
  1/2/4/8-device scaling sweep.  Virtual devices share physical cores, so
  these numbers validate the sharded program shape and reduction overhead,
  NOT ICI scaling (one real chip this round).

Usage: python benchmarks/config5.py --mode tpu [--spp 256] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tpu_run(args):
    import jax

    import spira_tpu as st
    from spira_tpu.pipeline import render_progressive
    from spira_tpu.utils.config import RenderConfig

    scene = st.create_scene()
    camera = st.default_camera(args.width / args.height)
    cfg = RenderConfig(
        width=args.width, height=args.height, spp=args.spp,
        max_depth=args.max_depth, seed=3,
        checkpoint_every=args.chunk, checkpoint_dir=args.ckpt_dir,
        progress=False,
    )
    t0 = time.perf_counter()
    img = render_progressive(scene, camera, cfg)
    dt = time.perf_counter() - t0
    rays = args.width * args.height * args.spp * args.max_depth
    stats = jax.local_devices()[0].memory_stats() or {}
    return {
        "backend": jax.default_backend(),
        "seconds": round(dt, 2),
        "rays_per_sec": round(rays / dt, 1),
        "chunks": -(-args.spp // args.chunk),
        "checkpointed": bool(args.ckpt_dir),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        "image_mean": float(img.mean()),
    }


def virtual_run(args):
    import jax

    jax.config.update("jax_platforms", "cpu")

    import spira_tpu as st
    from spira_tpu.parallel.mesh import make_mesh, replicate
    from spira_tpu.parallel.sharded import render_flat_sharded
    from spira_tpu.pipeline import render_progressive
    from spira_tpu.utils.config import RenderConfig

    n_dev = jax.device_count()
    scene = st.create_scene()
    camera = st.default_camera(args.width / args.height)

    # config-5 shape, spp scaled down for CPU throughput; the program
    # (tile-sharded chunks + psum + checkpoint cadence) is the real one
    spp = args.virtual_spp
    cfg = RenderConfig(
        width=args.width, height=args.height, spp=spp,
        max_depth=args.max_depth, seed=3, checkpoint_every=args.chunk,
        progress=False,
    )
    mesh = make_mesh(n_tile=n_dev, n_spp=1)
    t0 = time.perf_counter()
    render_progressive(
        replicate(scene, mesh), replicate(camera, mesh), cfg, mesh=mesh
    )
    dt = time.perf_counter() - t0
    rays = args.width * args.height * spp * args.max_depth
    out = {
        "devices": n_dev,
        "spp": spp,
        "seconds": round(dt, 2),
        "rays_per_sec": round(rays / dt, 1),
        "note": "virtual CPU devices share physical cores: validates the "
                "sharded chunked program, not ICI scaling",
    }

    sweep = []
    for n in (1, 2, 4, 8):
        if n > n_dev or args.height % n:
            continue
        m = make_mesh(n_tile=n, n_spp=1, devices=jax.devices()[:n])
        sc, cam = replicate(scene, m), replicate(camera, m)

        def run(seed):
            return render_flat_sharded(
                sc, cam, width=640, height=360, mesh=m, spp=16,
                max_depth=4, seed=seed, engine="fused",
            )

        jax.block_until_ready(run(0))
        t0 = time.perf_counter()
        for i in range(5):
            o = run(i + 1)
        jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / 5
        sweep.append(
            {"devices": n, "rays_per_sec": round(640 * 360 * 16 * 4 / dt, 1)}
        )
    return {"config5_virtual_mesh": out, "scaling_sweep_virtual": sweep}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["tpu", "virtual"], required=True)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--spp", type=int, default=256)
    p.add_argument("--virtual-spp", type=int, default=8)
    p.add_argument("--max-depth", type=int, default=4)
    p.add_argument("--chunk", type=int, default=32)
    p.add_argument("--ckpt-dir", default="")
    p.add_argument("--out", default="")
    args = p.parse_args()

    if args.mode == "tpu":
        res = {"config5_tpu_single_chip": dict(
            width=args.width, height=args.height, spp=args.spp,
            max_depth=args.max_depth, **tpu_run(args))}
    else:
        res = virtual_run(args)

    print(json.dumps(res), flush=True)
    if args.out:
        merged = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                merged = json.load(f)
        merged.update(res)
        with open(args.out, "w") as f:
            json.dump(merged, f, indent=1)
        print(f"merged into {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
