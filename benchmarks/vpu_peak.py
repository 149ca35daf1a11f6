"""Measure the VPU's peak vector-op issue rate (the speed-of-light
calibration constant for `spira_tpu.utils.sol`).

The round-4 dtype microbench (1314 GFLOP/s fp32) counted FMA as two flops
on a memory-adjacent loop; the traversal cost model needs the ISSUE rate —
independent same-shape register chains with no memory traffic, counting
every vector instruction (mul/add/min/max/cmp/select alike) as ONE op.
Eight independent chains give the scheduler ILP to fill all VPU pipes.

Usage: python benchmarks/vpu_peak.py  → prints lane-ops/s, updates nothing
(copy the constant into spira_tpu/utils/sol.py if it moves materially).
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TILE = (32, 128)
    ITERS = 2000
    CHAINS = 8

    def kernel(x_ref, o_ref):
        xs = [x_ref[:] + jnp.float32(i) for i in range(CHAINS)]

        def body(i, xs):
            # per chain per iter: 1 fma (counted as 2 ops: mul+add at the
            # fma floor) + 1 min — 3 lane-ops, all register-resident
            return tuple(
                jnp.minimum(x * jnp.float32(1.000001) + jnp.float32(1e-7),
                            jnp.float32(1e30))
                for x in xs
            )

        xs = jax.lax.fori_loop(0, ITERS, body, tuple(xs))
        acc = xs[0]
        for x in xs[1:]:
            acc = acc + x
        o_ref[:] = acc

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(TILE, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    x = jnp.ones(TILE, jnp.float32)
    jax.block_until_ready(run(x))
    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        out = run(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    lanes = TILE[0] * TILE[1]
    # 3 lane-ops (mul+add+min) per chain per iter
    ops = 3 * CHAINS * ITERS * lanes
    print(f"VPU issue rate: {ops / dt / 1e9:.0f} G lane-ops/s "
          f"({dt * 1e6:.1f} us/dispatch, backend={jax.default_backend()})")


if __name__ == "__main__":
    main()
