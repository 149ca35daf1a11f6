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
import sys
import time

BASELINE_RAYS_PER_SEC = 1.0e7

WIDTH, HEIGHT, SPP, MAX_DEPTH = 640, 360, 16, 4


def main() -> None:
    import jax
    import jax.numpy as jnp

    import spira_tpu as st
    from spira_tpu.diff.inverse import render_for_grad
    from spira_tpu.render import render_flat

    scene = st.create_scene()
    camera = st.default_camera(WIDTH / HEIGHT)

    def fwd(scene, camera, seed):
        return render_flat(
            scene,
            camera,
            width=WIDTH,
            height=HEIGHT,
            spp=SPP,
            max_depth=MAX_DEPTH,
            seed=seed,
        )

    # Target for the loss (content is irrelevant to throughput).
    target = jax.block_until_ready(fwd(scene, camera, 7))

    @jax.jit
    def train_step(params, scene, camera, target, seed):
        def loss_fn(params):
            img = render_for_grad(
                params,
                scene,
                camera,
                width=WIDTH,
                height=HEIGHT,
                spp=SPP,
                max_depth=MAX_DEPTH,
                seed=seed,
            )
            return jnp.mean((img - target) ** 2)

        return jax.value_and_grad(loss_fn)(params)

    params = {
        "albedo": scene.materials.albedo,
        "emission": scene.materials.emission,
    }

    # Warmup / compile.
    loss, grads = jax.block_until_ready(train_step(params, scene, camera, target, 0))
    print(f"warmup loss={float(loss):.6f}", file=sys.stderr)

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        loss, grads = train_step(params, scene, camera, target, i + 1)
    jax.block_until_ready((loss, grads))
    dt = (time.perf_counter() - t0) / iters

    rays = WIDTH * HEIGHT * SPP * MAX_DEPTH
    rays_per_sec = rays / dt

    # Secondary numbers to stderr for the record.
    t0 = time.perf_counter()
    for i in range(iters):
        out = fwd(scene, camera, i)
    jax.block_until_ready(out)
    fwd_dt = (time.perf_counter() - t0) / iters
    print(
        f"fwd only: {rays / fwd_dt / 1e6:.1f} Mrays/s ({fwd_dt * 1e3:.1f} ms); "
        f"fwd+bwd: {rays_per_sec / 1e6:.1f} Mrays/s ({dt * 1e3:.1f} ms); "
        f"inverse iters/sec: {1.0 / dt:.2f}",
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
        )
    )


if __name__ == "__main__":
    main()
