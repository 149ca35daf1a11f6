"""Speed-of-light model for the packet-BVH megakernel.

Answers "is N Mrays/s good?" with arithmetic instead of folklore
(round-4 verdict: the 73k-tri bar had no measured floor under it).  The
bound prices ONLY the irreducible vector arithmetic of the traversal's
measured work inventory — leaf triangle tests, child slab tests, the
any-hit reduce — at the VPU's measured peak issue rate, assuming zero
scalar-core cost, zero control overhead, and perfect pipeline overlap.
Real kernels cannot beat it; ``sol_pct`` (bound / measured) says how much
of the remaining gap is even theoretically winnable **at the current work
inventory** — work-removal levers (better trees, better culling) move the
bound itself, which is the point of printing it next to every battery row.

Counts are audited against the kernel source (``kernels/bvh_megakernel.py``
round-5 form); the issue-rate constant comes from
``benchmarks/vpu_peak.py`` (register-resident FMA+min chains, v5e).
"""

from __future__ import annotations

import math

#: Measured VPU vector-issue rate on v5e (lane-ops/s), counting every
#: vector instruction (mul/add/min/max/cmp/select) as one op per lane and
#: an FMA as two.  Measured round-5 by benchmarks/vpu_peak.py (register-
#: resident fma+min chains, 8-way ILP): 5607 G lane-ops/s on the bench
#: chip.  Re-measure per chip class.
VPU_LANE_OPS_PER_S = 5.607e12

#: Vector lane-ops per triangle in the Baldwin–Weber leaf test
#: (den 5, num 6, reciprocal+Newton 5, hit point 6, u 6, v 6,
#:  hit mask 11, winner selects 5 — kernel lines `leaf_form == "bw"`).
LEAF_OPS_PER_TRI_BW = 50
#: Möller–Trumbore form for comparison (cross products dominate).
LEAF_OPS_PER_TRI_MT = 66

#: Vector lane-ops per child slab test (6 x-axis, 8 y, 8 z, 4 mask).
SLAB_OPS_PER_CHILD = 26


def reduce_ops_per_batch(pops_per_iter: int, tile_h: int) -> int:
    """Any-hit bitmask OR-tree: 2 ops per plane fold + lane/sublane rolls."""
    if pops_per_iter == 1:
        return 8  # packed float/int sum path
    return 4 * pops_per_iter + 2 * (7 + int(math.log2(max(tile_h, 1))))


def vpu_lower_bound_seconds(
    counters: dict,
    *,
    tile_h: int = 32,
    pops_per_iter: int = 16,
    rows_per_visit: int = 1,
    tris_per_row: int = 8,
    form: str = "bw",
) -> dict:
    """Arithmetic lower bound for a traversal workload.

    ``counters``: the dict from
    :func:`spira_tpu.kernels.bvh_megakernel.render_bvh_with_counters`
    (needs ``leaf_visits`` and ``pop_batches``).  Returns a dict with the
    bound in seconds and its term breakdown.
    """
    lanes = tile_h * 128
    per_tri = LEAF_OPS_PER_TRI_BW if form == "bw" else LEAF_OPS_PER_TRI_MT
    leaf_ops = (
        counters["leaf_visits"] * rows_per_visit * tris_per_row * per_tri
    )
    slab_ops = (
        counters["pop_batches"] * 2 * pops_per_iter * SLAB_OPS_PER_CHILD
    )
    reduce_ops = counters["pop_batches"] * reduce_ops_per_batch(
        pops_per_iter, tile_h
    )
    total = (leaf_ops + slab_ops + reduce_ops) * lanes
    bound_s = total / VPU_LANE_OPS_PER_S
    return {
        "bound_s": bound_s,
        "leaf_s": leaf_ops * lanes / VPU_LANE_OPS_PER_S,
        "slab_s": slab_ops * lanes / VPU_LANE_OPS_PER_S,
        "reduce_s": reduce_ops * lanes / VPU_LANE_OPS_PER_S,
        "lane_ops": int(total),
    }


def sol_pct(bound_s: float, measured_s: float) -> float:
    """% of the speed-of-light bound achieved (100 = at the bound)."""
    if measured_s <= 0:
        return float("nan")
    return 100.0 * bound_s / measured_s
