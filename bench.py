"""Headline benchmark: rays/sec/chip, forward+backward, at the reference's
flagship config (640×360, spp=16, max_depth=4 — BASELINE.md primary metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

"Rays" counts traced path segments in the forward estimator
(W·H·spp·max_depth); the timed region is a full differentiable step —
forward render, MSE loss against a target image, and gradients w.r.t. all
material parameters (the inverse-rendering workload, BASELINE.json config 4).

vs_baseline: the reference publishes no measured numbers
(BASELINE.json.published == {}); its only quantitative claim is "10–50×
faster than CPU" for its Metal GPU path.  We peg the baseline at 1e7
segments/s — a mid-range estimate of that claimed GPU-class throughput
(CPU path tracers of this complexity run ~0.2–1 Mrays/s/core) — so
vs_baseline = value / 1e7.
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_RAYS_PER_SEC = 1.0e7

WIDTH, HEIGHT, SPP, MAX_DEPTH = 640, 360, 16, 4


def _time(fn, iters, *args):
    import jax

    out = jax.block_until_ready(fn(*args, 0))  # warmup/compile
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*args, i + 1)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    import jax
    import jax.numpy as jnp

    import spira_tpu as st
    from spira_tpu.core.types import replace
    from spira_tpu.kernels.megakernel import (
        render_flat_fused,
        render_flat_megakernel,
    )
    from spira_tpu.render import render_flat

    scene = st.create_scene()
    camera = st.default_camera(WIDTH / HEIGHT)
    rays = WIDTH * HEIGHT * SPP * MAX_DEPTH
    kw = dict(width=WIDTH, height=HEIGHT, spp=SPP, max_depth=MAX_DEPTH)

    target = jax.block_until_ready(
        render_flat_fused(scene, camera, **kw, seed=7)
    )

    # Headline: full differentiable step — forward render + MSE loss +
    # gradients w.r.t. all material fields — on the hybrid engine:
    # Pallas-megakernel forward, fused-XLA backward replay at grad_spp=4
    # (kernels/megakernel.py:render_flat_hybrid_grad; loss is exact
    # full-spp, the gradient the standard unbiased subsampled estimator).
    # Fallback: fused-XLA value_and_grad (identical estimator family).
    headline_engine = "hybrid pallas-fwd/fused-bwd (grad_spp=4)"
    try:
        from spira_tpu.kernels.megakernel import render_flat_hybrid_grad

        @jax.jit
        def train_step(materials, seed):
            def loss_fn(materials):
                img = render_flat_hybrid_grad(
                    replace(scene, materials=materials), camera, **kw,
                    seed=seed, grad_spp=4,
                )
                return jnp.mean((img - target) ** 2)

            return jax.value_and_grad(loss_fn)(materials)

        def step(seed):
            return train_step(scene.materials, jnp.int32(seed))

        dt_bwd = _time(lambda i: step(i), 20)
        loss, _ = step(0)
    except Exception as e:  # pragma: no cover - TPU-env guard
        print(f"pallas grad kernel unavailable ({e!r}); "
              "falling back to fused-XLA", file=sys.stderr)
        headline_engine = "fused-XLA value_and_grad"

        @jax.jit
        def train_step(materials, scene, camera, target, seed):
            def loss_fn(materials):
                img = render_flat_fused(
                    replace(scene, materials=materials), camera, **kw,
                    seed=seed,
                )
                return jnp.mean((img - target) ** 2)

            return jax.value_and_grad(loss_fn)(materials)

        def step(seed):
            return train_step(scene.materials, scene, camera, target, seed)

        dt_bwd = _time(lambda i: step(i), 20)
        loss, _ = step(0)
    print(
        f"loss check: {float(loss):.6f} ({headline_engine})", file=sys.stderr
    )
    rays_per_sec = rays / dt_bwd

    # Secondary engines to stderr for the record.
    dt_fused = _time(
        lambda i: render_flat_fused(scene, camera, **kw, seed=i), 20
    )
    dt_wave = _time(
        lambda i: render_flat(scene, camera, **kw, seed=i), 5
    )
    print(
        f"fwd fused-xla: {rays / dt_fused / 1e6:.0f} Mrays/s ({dt_fused * 1e3:.2f} ms); "
        f"fwd wavefront: {rays / dt_wave / 1e6:.1f} Mrays/s ({dt_wave * 1e3:.1f} ms); "
        f"fwd+bwd headline: {rays_per_sec / 1e6:.0f} Mrays/s ({dt_bwd * 1e3:.2f} ms); "
        f"inverse iters/sec: {1.0 / dt_bwd:.2f}",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "rays/sec/chip fwd+bwd at 640x360 spp=16 depth=4",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
            }
        ),
        flush=True,
    )

    # The Pallas megakernel is the fastest forward engine, but a cold Mosaic
    # compile through this environment's remote-compile helper can take many
    # minutes — measure it strictly AFTER the headline JSON is out, and only
    # unless disabled.
    if os.environ.get("SPIRA_BENCH_PALLAS", "1") != "0":
        dt_pallas = _time(
            lambda i: render_flat_megakernel(scene, camera, **kw, seed=i), 20
        )
        print(
            f"fwd pallas megakernel: {rays / dt_pallas / 1e6:.0f} Mrays/s "
            f"({dt_pallas * 1e3:.2f} ms)",
            file=sys.stderr,
        )

    # Mesh tier (BASELINE config 3): bunny-class scene on the packet-BVH
    # Pallas engine.
    if os.environ.get("SPIRA_BENCH_MESH", "1") != "0":
        try:
            from spira_tpu.kernels.bvh_megakernel import (
                render_flat_bvh_megakernel,
            )
            from spira_tpu.scene.bunny import bunny_camera, create_bunny_scene

            mscene, minfo = create_bunny_scene()
            mcamera = bunny_camera(WIDTH / HEIGHT)
            n_tris = minfo["triangles"]
            dt_mesh = _time(
                lambda i: render_flat_bvh_megakernel(
                    mscene, mcamera, **kw, seed=i
                ),
                5,
            )
            print(
                f"fwd packet-BVH megakernel ({n_tris} tris): "
                f"{rays / dt_mesh / 1e6:.0f} Mrays/s ({dt_mesh * 1e3:.1f} ms)",
                file=sys.stderr,
            )
        except Exception as e:  # pragma: no cover - TPU-env guard
            print(f"mesh bench skipped ({e!r})", file=sys.stderr)


if __name__ == "__main__":
    main()
