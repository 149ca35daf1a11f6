"""Where does the packet kernel's time go? (VERDICT r3 item 2a)

Two measurements on the real chip:

1. ``counters`` — run the row engine with in-kernel work counters
   (`render_bvh_with_counters`) on the three mesh tiers + the plain engine
   timed alongside; least-squares fit  time ≈ pops·c_pop + leafs·c_leaf
   across the tiers gives the measured per-op costs over the FULL
   spp×bounce workload (host-side primary-ray analytics mispredicted the
   round-3 MXU engine by ~5×; these are the real numbers).

2. ``vpu`` — fp32 vs bf16 VPU throughput microbenchmark (chained
   elementwise ops on resident tiles): is bf16 a ~2× lever for the slab /
   leaf tests (VERDICT item 2b) or wishful thinking?

Appends JSON lines to benchmarks/round4_timings.jsonl.
Usage: python benchmarks/packet_profile.py [--tier counters|vpu|all]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from round4_timings import W, H, SPP, DEPTH, _bunny_scene, _mesh_scene, \
    _record, _time  # noqa: E402


def tier_counters():
    import jax

    from spira_tpu.kernels.bvh_megakernel import (
        render_bvh_with_counters,
        render_flat_bvh_megakernel,
    )

    rays = W * H * SPP * DEPTH
    kw = dict(width=W, height=H, spp=SPP, max_depth=DEPTH)
    rows = []
    for name, scene_fn in [("mesh1600", lambda: _mesh_scene(3)),
                           ("mesh5440", lambda: _mesh_scene(4)),
                           ("bunny", _bunny_scene)]:
        try:
            scene, cam, ntris = scene_fn()
            dt, compile_s = _time(lambda i: render_flat_bvh_megakernel(
                scene, cam, **kw, seed=i), 5)
            _, ctr = render_bvh_with_counters(scene, cam, **kw, seed=0)
            # counter-mode timing too (sanity: overhead should be ~noise)
            dt_c, _ = _time(lambda i: render_bvh_with_counters(
                scene, cam, **kw, seed=i)[0], 3)
            row = dict(tier="counters", scene=name, tris=ntris,
                       mrays_s=round(rays / dt / 1e6, 1),
                       run_ms=round(dt * 1e3, 1),
                       run_ms_with_counters=round(dt_c * 1e3, 1),
                       compile_s=round(compile_s, 1), **ctr)
            # per-pop/per-leaf averages for eyeballing
            row["us_per_pop_batch_upper"] = round(
                dt * 1e6 / max(ctr["pop_batches"], 1), 3)
            _record(**row)
            rows.append((dt, ctr))
        except Exception as e:
            _record(tier="counters", scene=name, ok=False, error=repr(e))
    # least-squares fit time = pops*c_pop + leafs*c_leaf (+ trav*c_fix)
    if len(rows) >= 2:
        import numpy as np

        A = np.array([[c["pop_batches"], c["leaf_visits"], c["traversals"]]
                      for _, c in rows], float)
        b = np.array([dt for dt, _ in rows])
        coef, res, *_ = np.linalg.lstsq(A, b, rcond=None)
        _record(tier="counters", scene="fit",
                us_per_pop_batch=round(coef[0] * 1e6, 3),
                us_per_leaf_visit=round(coef[1] * 1e6, 3),
                us_per_traversal=round(coef[2] * 1e6, 3),
                residual=float(res[0]) if len(res) else None)


def tier_vpu():
    """fp32 vs bf16 elementwise throughput on resident tiles."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ROWS, COLS, CHAIN = 256, 128, 512

    def kernel(x_ref, o_ref, *, dtype):
        x = x_ref[:].astype(dtype)
        acc = x
        c1 = jnp.asarray(1.0000001, dtype)
        c2 = jnp.asarray(0.9999999, dtype)
        for _ in range(CHAIN):
            acc = acc * c1 + x * c2  # 2 ops per step
        o_ref[:] = acc.astype(jnp.float32)

    @functools.partial(jax.jit, static_argnames=("dtype_name",))
    def run(x, dtype_name):
        dtype = dict(f32=jnp.float32, bf16=jnp.bfloat16)[dtype_name]
        return pl.pallas_call(
            functools.partial(kernel, dtype=dtype),
            out_shape=jax.ShapeDtypeStruct((ROWS, COLS), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    x = jnp.ones((ROWS, COLS), jnp.float32) * 0.5
    for dname in ("f32", "bf16"):
        try:
            jax.block_until_ready(run(x, dname))
            t0 = time.perf_counter()
            iters = 200
            for _ in range(iters):
                out = run(x, dname)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / iters
            ops = 2 * CHAIN * ROWS * COLS
            _record(tier="vpu", dtype=dname,
                    us_per_call=round(dt * 1e6, 2),
                    gflop_s=round(ops / dt / 1e9, 1))
        except Exception as e:
            _record(tier="vpu", dtype=dname, ok=False, error=repr(e))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default="all",
                    choices=["counters", "vpu", "all"])
    args = ap.parse_args()
    tiers = (["vpu", "counters"] if args.tier == "all" else [args.tier])
    for t in tiers:
        {"counters": tier_counters, "vpu": tier_vpu}[t]()


if __name__ == "__main__":
    main()
