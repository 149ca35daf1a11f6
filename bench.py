"""Headline benchmark: rays/sec/chip, forward+backward, at the reference's
flagship config (640×360, spp=16, max_depth=4 — BASELINE.md primary metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

"Rays" counts traced path segments in the forward estimator
(W·H·spp·max_depth); the timed region is a full differentiable step —
forward render, MSE loss against a target image, and gradients w.r.t. all
material parameters (the inverse-rendering workload, BASELINE.json config 4).

The headline ``value`` is the EXACT-replay number (backward replays all spp
samples).  The grad_spp=4 stochastic-subsampled estimator — unbiased, ~4×
less backward work, the practical inverse-rendering configuration — is
reported alongside in the same JSON (``subsampled_grad_spp4``) and stderr.

vs_baseline: the reference publishes no measured numbers
(BASELINE.json.published == {}); its only quantitative claim is "10–50×
faster than CPU" for its Metal GPU path.  We peg the baseline at 1e7
segments/s — a mid-range estimate of that claimed GPU-class throughput
(CPU path tracers of this complexity run ~0.2–1 Mrays/s/core) — so
vs_baseline = value / 1e7.

Robustness: the TPU here sits behind a remote tunnel that can flake at
init.  Before importing jax in this process we probe the backend in a
subprocess with bounded retry/backoff (total budget
SPIRA_BENCH_PROBE_BUDGET, default 600 s).  If the backend never comes up we
fall back to CPU and still emit the JSON (with "platform": "cpu") rather
than zeroing the round.  Every tier after the headline is individually
guarded so the JSON line always lands.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASELINE_RAYS_PER_SEC = 1.0e7

WIDTH, HEIGHT, SPP, MAX_DEPTH = 640, 360, 16, 4

_PROBE_CODE = """
import jax, jax.numpy as jnp
d = jax.devices()
jnp.zeros(()).block_until_ready()
print(d[0].platform)
"""


def wait_for_backend() -> str:
    """Probe the device backend in a subprocess with retry/backoff.

    Returns the platform name ("tpu"/"axon"/...) on success, or "cpu" after
    the budget is exhausted (caller then forces the CPU platform).  A
    subprocess is used because a failed backend init is cached inside a JAX
    process — only a fresh interpreter can retry.
    """
    budget = float(os.environ.get("SPIRA_BENCH_PROBE_BUDGET", "600"))
    per_try = float(os.environ.get("SPIRA_BENCH_PROBE_TIMEOUT", "300"))
    deadline = time.time() + budget
    delay = 15.0
    attempt = 0
    while True:
        attempt += 1
        try:
            out = subprocess.run(
                [sys.executable, "-c", _PROBE_CODE],
                capture_output=True, text=True, timeout=per_try,
            )
            if out.returncode == 0:
                platform = out.stdout.strip().splitlines()[-1]
                print(f"backend probe ok (attempt {attempt}): {platform}",
                      file=sys.stderr)
                return platform
            msg = (out.stderr or "").strip().splitlines()
            print(f"backend probe attempt {attempt} failed (rc="
                  f"{out.returncode}): {msg[-1] if msg else '?'}",
                  file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"backend probe attempt {attempt} hung >{per_try:.0f}s",
                  file=sys.stderr)
        if time.time() + delay > deadline:
            print("backend probe budget exhausted; falling back to CPU",
                  file=sys.stderr)
            return "cpu"
        time.sleep(delay)
        delay = min(delay * 2, 120.0)


_CPU_FALLBACK = False  # set by main(); trims iteration counts


def _time(fn, iters, *args, floor_s=0.0):
    """Time ``iters`` dispatches of ``fn``; block on the last.

    ``floor_s`` guards against the tunnel-wedge artifact where executes are
    acknowledged without running (round-4 battery recorded one impossible
    2820 Mrays/s row this way; a wedged session here once returned a
    grad_spp=4 step in 0.22 ms — 50× past physics).  A measurement under
    the floor is re-timed up to twice; if it stays implausible,
    ImplausibleTiming is raised so the caller drops the field instead of
    publishing a wedged number."""
    import jax

    if _CPU_FALLBACK:
        iters = min(iters, 2)
        floor_s = 0.0  # CPU timings are slow; the floor is a TPU bound

    def once():
        jax.block_until_ready(fn(*args, 0))  # warmup/compile
        t0 = time.perf_counter()
        out = None
        for i in range(iters):
            out = fn(*args, i + 1)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    dt = once()
    for _ in range(2):
        if dt >= floor_s:
            return dt
        print(f"implausible timing {dt * 1e3:.2f} ms < floor "
              f"{floor_s * 1e3:.1f} ms — wedge suspected, re-timing",
              file=sys.stderr)
        time.sleep(5.0)
        dt = once()
    if dt < floor_s:
        raise ImplausibleTiming(
            f"{dt * 1e3:.2f} ms < physical floor {floor_s * 1e3:.1f} ms "
            "after retries (tunnel wedge)")
    return dt


class ImplausibleTiming(RuntimeError):
    pass


def main() -> None:
    platform = wait_for_backend()

    import jax
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        # emergency fallback: the headline JSON still lands, but trim the
        # iteration counts and skip the TPU-only tiers so the whole run
        # fits the driver's budget
        global _CPU_FALLBACK
        _CPU_FALLBACK = True
        os.environ.setdefault("SPIRA_BENCH_PALLAS", "0")
        os.environ.setdefault("SPIRA_BENCH_MESH", "0")
    import jax.numpy as jnp

    import spira_tpu as st
    from spira_tpu.core.types import replace
    from spira_tpu.kernels.megakernel import (
        render_flat_fused,
        render_flat_hybrid_grad,
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

    # Full differentiable step — forward render + MSE loss + gradients
    # w.r.t. all material fields — on the hybrid engine: Pallas-megakernel
    # forward, fused-XLA backward replay (kernels/megakernel.py:
    # render_flat_hybrid_grad).  Measured at exact replay (grad_spp=spp,
    # the headline) and at the grad_spp=4 subsampled estimator.
    # Fallback: fused-XLA value_and_grad (identical estimator family).
    def make_step(engine, grad_spp):
        @jax.jit
        def train_step(materials, seed):
            def loss_fn(materials):
                s = replace(scene, materials=materials)
                if engine == "hybrid":
                    img = render_flat_hybrid_grad(
                        s, camera, **kw, seed=seed, grad_spp=grad_spp)
                else:
                    img = render_flat_fused(s, camera, **kw, seed=seed)
                return jnp.mean((img - target) ** 2)

            return jax.value_and_grad(loss_fn)(materials)

        return lambda seed: train_step(scene.materials, jnp.int32(seed))

    # Physical floors (v5e, this config): best-known exact replay is
    # ~30 ms and grad_spp=4 ~11 ms; anything several× past those is the
    # tunnel-wedge artifact, not a speedup.
    FLOOR_EXACT, FLOOR_SUB = 8e-3, 2e-3
    headline_engine = "hybrid pallas-fwd/fused-bwd (exact replay)"
    wedge_suspected = False
    try:
        step_exact = make_step("hybrid", SPP)
        try:
            dt_exact = _time(lambda i: step_exact(i), 20,
                             floor_s=FLOOR_EXACT)
        except ImplausibleTiming as e:
            wedge_suspected = True
            print(f"headline timing implausible ({e}); publishing the "
                  "floor-violating value WITH wedge_suspected=true",
                  file=sys.stderr)
            dt_exact = _time(lambda i: step_exact(i), 20)
        loss, _ = step_exact(0)
    except Exception as e:  # pragma: no cover - TPU-env guard
        print(f"hybrid grad engine unavailable ({e!r}); "
              "falling back to fused-XLA", file=sys.stderr)
        headline_engine = "fused-XLA value_and_grad"
        step_exact = make_step("fused", SPP)
        dt_exact = _time(lambda i: step_exact(i), 20)
        loss, _ = step_exact(0)
    print(f"loss check: {float(loss):.6f} ({headline_engine})",
          file=sys.stderr)
    rays_per_sec = rays / dt_exact

    dt_sub = None
    if headline_engine.startswith("hybrid"):
        try:
            step_sub = make_step("hybrid", 4)
            dt_sub = _time(lambda i: step_sub(i), 20, floor_s=FLOOR_SUB)
        except Exception as e:  # pragma: no cover - TPU-env guard
            print(f"grad_spp=4 tier skipped ({e!r})", file=sys.stderr)

    record = {
        "metric": "rays/sec/chip fwd+bwd (exact replay) at 640x360 spp=16 depth=4",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
        "platform": platform,
        "engine": headline_engine,
        "inverse_iters_per_sec": round(1.0 / dt_exact, 2),
    }
    if dt_sub is not None:
        record["subsampled_grad_spp4"] = round(rays / dt_sub, 1)
    if wedge_suspected:
        record["wedge_suspected"] = True
    print(json.dumps(record), flush=True)
    print(
        f"fwd+bwd exact replay: {rays_per_sec / 1e6:.0f} Mrays/s "
        f"({dt_exact * 1e3:.2f} ms); "
        + (f"fwd+bwd grad_spp=4: {rays / dt_sub / 1e6:.0f} Mrays/s "
           f"({dt_sub * 1e3:.2f} ms); " if dt_sub else "")
        + f"inverse iters/sec: {1.0 / dt_exact:.2f}",
        file=sys.stderr,
    )

    # Secondary engines to stderr for the record; each guarded so a failure
    # here can't take down the (already-printed) headline JSON.
    try:
        dt_fused = _time(
            lambda i: render_flat_fused(scene, camera, **kw, seed=i), 20,
            floor_s=2e-3)
        print(f"fwd fused-xla: {rays / dt_fused / 1e6:.0f} Mrays/s "
              f"({dt_fused * 1e3:.2f} ms)", file=sys.stderr)
    except Exception as e:  # pragma: no cover - TPU-env guard
        print(f"fused tier skipped ({e!r})", file=sys.stderr)
    try:
        dt_wave = _time(
            lambda i: render_flat(scene, camera, **kw, seed=i), 5)
        print(f"fwd wavefront: {rays / dt_wave / 1e6:.1f} Mrays/s "
              f"({dt_wave * 1e3:.1f} ms)", file=sys.stderr)
    except Exception as e:  # pragma: no cover - TPU-env guard
        print(f"wavefront tier skipped ({e!r})", file=sys.stderr)

    # The Pallas megakernel is the fastest forward engine, but a cold Mosaic
    # compile through this environment's remote-compile helper can take many
    # minutes — measured strictly AFTER the headline JSON is out.
    if os.environ.get("SPIRA_BENCH_PALLAS", "1") != "0":
        try:
            dt_pallas = _time(
                lambda i: render_flat_megakernel(scene, camera, **kw, seed=i),
                20, floor_s=1.5e-3)
            print(f"fwd pallas megakernel: {rays / dt_pallas / 1e6:.0f} "
                  f"Mrays/s ({dt_pallas * 1e3:.2f} ms)", file=sys.stderr)
        except Exception as e:  # pragma: no cover - TPU-env guard
            print(f"pallas tier skipped ({e!r})", file=sys.stderr)

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
                floor_s=50e-3,
            )
            print(
                f"fwd packet-BVH megakernel ({n_tris} tris): "
                f"{rays / dt_mesh / 1e6:.0f} Mrays/s ({dt_mesh * 1e3:.1f} ms)",
                file=sys.stderr,
            )
            # Differentiable MESH step (the round-3 flagship gap, fixed in
            # round 4): packet-BVH Pallas forward + packet-hook backward
            try:
                from spira_tpu.core.types import replace
                from spira_tpu.render import render_flat_hybrid_grad_mesh

                a0 = mscene.materials.albedo

                @jax.jit
                def mesh_step(albedo, seed):
                    def loss_fn(a):
                        s = replace(mscene, materials=replace(
                            mscene.materials, albedo=a))
                        img = render_flat_hybrid_grad_mesh(
                            s, mcamera, **kw, seed=seed, grad_spp=2)
                        return jnp.mean(img)

                    return jax.value_and_grad(loss_fn)(albedo)

                dt_mg = _time(
                    lambda i: mesh_step(a0, jnp.int32(i))[1], 3)
                print(
                    f"fwd+bwd mesh hybrid grad_spp=2 ({n_tris} tris): "
                    f"{rays / dt_mg / 1e6:.1f} Mrays/s "
                    f"({dt_mg * 1e3:.1f} ms)",
                    file=sys.stderr,
                )
            except Exception as e:  # pragma: no cover - TPU-env guard
                print(f"mesh grad tier skipped ({e!r})", file=sys.stderr)
        except Exception as e:  # pragma: no cover - TPU-env guard
            print(f"mesh bench skipped ({e!r})", file=sys.stderr)


if __name__ == "__main__":
    main()
