"""Retired experimental engines — kept callable for reproducibility, not
recommended for production (VERDICT r3 item 6: prune the engine zoo).

Two MXU-leaf traversal engines were built in rounds 2–3 on the hypothesis
that replacing the packet kernel's scalar-broadcast Möller–Trumbore leaf
loop with 128-triangle Plücker-coefficient blocks contracted on the MXU
would beat the VPU at bunny scale.  Both are *measured losers* on v5e
(640×360 spp16 d4, benchmarks/round3_timings.jsonl):

========================  =========  =========  =========
engine                    1.6k tris  5.4k tris  73k tris
========================  =========  =========  =========
pallas_bvh (production)   74.1       36.5       18.6
pallas_bvh_mxu (fp32)     27.0       11.9        1.4
pallas_bvh_mxu (bf16)     71.5       26.6        3.0
pallas_mxu (streaming)     8.3 (at its best tier)
========================  =========  =========  =========
(Mrays/s; full post-mortem in docs/ARCHITECTURE.md "MXU superleaf
post-mortem".)

Why they lose: the MXU visit must test all 128 triangles of a superleaf
block against the whole packet on every leaf pop, while the VPU leaf loop
tests at most ``max_leaf``≤16 — the tree-culling advantage of small leaves
beats raw MXU FLOPs at every measured scene size, and the bf16 contraction
tier only narrows (never closes) the gap.  The experiment stays in-tree
because the block-packing machinery (`accel.mxu`) is reusable and the
result is a real negative datum for future TPU ray-tracing work.

Usage (identical semantics to the production packet engine)::

    from spira_tpu.experiments import render_flat_bvh_mxu, render_flat_mxu

    img = render_flat_bvh_mxu(scene, camera, width=W, height=H)   # superleaf
    img = render_flat_mxu(scene, camera, width=W, height=H)       # streaming

Both attach their block packings on first use (`accel.mxu.attach_superleaf`
/ `attach_mxu`); do that once outside a render loop for repeated calls.
"""

from __future__ import annotations


def render_flat_bvh_mxu(scene, camera, **kw):
    """Packet traversal with MXU superleaf leaves (pallas_bvh_mxu)."""
    from .render import render_flat_engine

    return render_flat_engine(scene, camera, engine="pallas_bvh_mxu", **kw)


def render_flat_mxu(scene, camera, **kw):
    """Streaming superleaf MXU megakernel (pallas_mxu)."""
    from .render import render_flat_engine

    return render_flat_engine(scene, camera, engine="pallas_mxu", **kw)
