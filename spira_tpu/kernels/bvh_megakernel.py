"""Packet-traversal BVH path-trace megakernel (Pallas TPU).

The TPU answer to the reference's in-kernel BVH megakernel
(`trace_ray_gpu` + `hit_bvh` stack traversal,
`/root/reference/examples/julia-raytracer-optimized.jl:1710-1830`): where a
Metal thread owns one ray and walks the tree with a private `uint stack[64]`,
a TPU program owns a (tile_h, 128) *tile* of rays that walk the tree
TOGETHER — classic packet tracing (Wald et al. 2001) reshaped for a 128-lane
vector machine:

* ONE scalar traversal stack in SMEM drives the walk for the whole packet;
* every box test / triangle test is a full-tile VPU op against *broadcast*
  scalars — there are **zero per-lane gathers** (the op the round-1 cost
  model measured at ~100x slow inside XLA loop bodies);
* node pairs and leaf triangles live VMEM-resident for the whole render
  (`accel/pairs.py` packs them so the only dynamic access is a row load at
  a dynamic sublane index — the supported-fast Mosaic case).

Traversal order (measured on v5e — see docs/ARCHITECTURE.md cost model):

* **pair records, one reduce per pop**: a popped record holds BOTH
  children's boxes; both slab tests are VPU ops, and their two any-lane
  bits come out of ONE cross-lane sum — per-lane ``hit0*1 + hit1*2048``
  summed over 1024 lanes packs both hit counts exactly into a float32
  (max 1024 + 1024*2048 < 2^24), decoded with scalar floor/subtract;
  packets taller than 2048 lanes switch to an exact int32 sum.
  The reduce's vector→scalar round trip is the dominant per-pop cost —
  it stalls the scalar unit that feeds the next pop — which is why
* **tall packets win**: (32, 128) tiles amortize that round trip over
  4096 rays; measured 640×360 spp16 d4 on v5e: 25→61 Mrays/s on a
  1.6k-tri mesh, 13→16 Mrays/s on the 73k-tri bunny tier vs (8, 128).
* **sphere-first seeding**: the static sphere unroll runs before traversal
  and seeds ``best_t``, so ground/light hits cull mesh subtrees behind
  them;
* **ordered descent**: internal children are pushed far-then-near by
  projecting box centers on the packet's mean ray (pure scalar math, no
  extra reduces), so near subtrees shrink ``best_t`` before far ones pop;
* **inline leaves**: leaf children are intersected at the parent's pop
  (never pushed), keeping the stack short and the triangle tests fresh.

Everything else — ray generation, the spp x bounce loop, BSDF scatter,
Russian roulette, sky/emission accumulation — is the exact
:func:`spira_tpu.kernels.megakernel.trace_tile` code, entered through its
``intersect_fn`` hook; mixed sphere+mesh scenes run fused end-to-end in one
dispatch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.mxu import BLOCK_ROWS, SUPERLEAF
from ..accel.pairs import TRI_STRIDE, TRIS_PER_ROW
from . import megakernel as mk

_HI = jax.lax.Precision.HIGHEST
_CD = (((1,), (0,)), ((), ()))  # contract lhs dim 1 with rhs dim 0

TILE_H = mk.TILE_H
TILE_W = mk.TILE_W
INF = mk.INF
T_MIN = mk.T_MIN
# Batched pops strand up to K un-popped entries per tree level, so the
# worst case is ~2*K*depth = 2*8*62 = 992 under the builder's depth cap
# (accel/bvh.py MAX_STACK-2); 1024 is a proven bound, and SMEM is cheap.
STACK_SIZE = 1024
_DISCARD = STACK_SIZE - 1  # masked pushes land here and are never read


def _check_stack_depth(depth: int, pops_per_iter: int,
                       defer_leaves: bool = False,
                       fanout: int = 2) -> None:
    """Refuse trees whose traversal could overflow the SMEM stack.

    Each of the K popped records pushes at most 2 entries, and a
    depth-D chain can hold up to 2K pending entries per level, so
    2*K*D (+K transient) bounds occupancy.  ``defer_leaves`` pushes leaf
    children too, adding one effective level.  Overflow would silently
    corrupt traversal through the shared _DISCARD slot."""
    if fanout * pops_per_iter > 64:
        # the any-hit OR-tree packs fanout*K bit planes into int32 words
        # (32 planes per word, at most two words / two scalar extracts
        # per batch); beyond 64 planes a third extract erases the
        # batching win and is refused rather than silently paid
        raise ValueError(
            f"pops_per_iter={pops_per_iter} (fanout {fanout}) exceeds the "
            "64-plane limit of the two-word any-hit bitmask reduce"
        )
    eff_depth = depth + 1 if defer_leaves else depth
    if fanout * pops_per_iter * eff_depth + pops_per_iter >= STACK_SIZE:
        raise ValueError(
            f"packed BVH depth {depth} with pops_per_iter={pops_per_iter} "
            f"could overflow the {STACK_SIZE}-entry traversal stack; "
            "rebuild with larger leaves or lower pops_per_iter"
        )
N_MAT_FIELDS = 10  # ar ag ab er eg eb metallic roughness ior transmission
#: bit-plane multiplier for the combined two-child hit-count reduce:
#: sum(hit0 + hit1*2048) <= 1024 + 1024*2048 < 2^24 — exact in float32.
_PLANE = np.float32(2048.0)


def _auto_pops(tree) -> int:
    """Measured auto pops_per_iter: deep trees amortize the vector->scalar
    pop readback over more children (v5e sweeps, rounds 4-5); quad records
    carry twice the children per row, so K halves at the same batch width.
    K>16 is supported via the two-word any-hit bitmask but measured SLOWER
    (bunny K=24: 29.5 vs 29.9 — the second scalar extract plus dummy-row
    stranding in narrow traversal phases eat the saved roll-trees)."""
    n_pairs = tree.pairs.shape[0]
    if getattr(tree, "fanout", 2) == 4:
        return 8 if n_pairs >= 2048 else (4 if n_pairs >= 256 else 1)
    return 16 if n_pairs >= 4096 else (8 if n_pairs >= 512 else 1)


def _with_dummy_row(pairs):
    """Append one all-empty pair record (cnt == -1 both halves): the row
    under-full pop batches read — its children never hit, leaf, or push."""
    return jnp.concatenate(
        [pairs, jnp.full((1, pairs.shape[1]), -1.0, pairs.dtype)], axis=0
    )


def traversal_scratch_shapes(tile_h: int = TILE_H, track_prim: bool = False):
    """Scratch buffers the packet traversal needs (see `make_packet_intersect`
    argument order): the scalar pair-row stack and the per-lane hit
    registers.  ``track_prim`` adds the winner-slot register the
    differentiable intersect hook reads (slot -> `PackedBVH.prim_map` ->
    original triangle, gradient-carrying hit recompute)."""
    shapes = [
        pltpu.SMEM((STACK_SIZE,), jnp.int32),       # pair-row stack
        pltpu.VMEM((tile_h, TILE_W), jnp.float32),  # best_t
        pltpu.VMEM((tile_h, TILE_W), jnp.float32),  # tnx
        pltpu.VMEM((tile_h, TILE_W), jnp.float32),  # tny
        pltpu.VMEM((tile_h, TILE_W), jnp.float32),  # tnz
        pltpu.VMEM((tile_h, TILE_W), jnp.float32),  # mat id
    ]
    if track_prim:
        shapes.append(pltpu.VMEM((tile_h, TILE_W), jnp.float32))  # slot id
    return shapes


def make_packet_intersect(
    pairs_ref,
    tris_ref,
    stack_ref,
    bt_ref,
    tnx_ref,
    tny_ref,
    tnz_ref,
    mid_ref,
    spheres,
    mats,
    *,
    root: int,
    rows_per_leaf: int,
    max_leaf: int,
    pops_per_iter: int = 1,
    dummy_row: int | None = None,
    mxu_refs=None,
    mxu_precision=_HI,
    sid_ref=None,
    ctr_ref=None,
    leaf_dtype=jnp.float32,
    leaf_broadcast="extract",
    leaf_gate=False,
    leaf_form="mt",
    slab_dtype=jnp.float32,
    defer_leaves=False,
    descent_order="mixed",
):
    """Build the ``intersect_fn`` plugged into ``trace_tile``.

    ``spheres``: list of 14-scalar tuples (static unroll, as in the sphere
    megakernel); ``mats``: list of 10-scalar material tuples indexed by the
    per-triangle material id selected during traversal.

    ``pops_per_iter``: pair records popped per while-loop iteration, paying
    the vector→scalar any-hit readback once for 2K children (one bitmask
    OR-tree + a single extract).  Requires ``dummy_row`` — the index of an
    all-empty (cnt == -1) pair record that under-full batches read
    harmlessly.  Measured on v5e at tile_h=32: neutral (±6%) on shallow
    trees where tall packets already amortize the readback, +9-17% on deep
    ones (5.4k-73k tris) — ``render_flat_bvh_megakernel`` auto-selects by
    tree size.

    ``mxu_refs``: optional ``(coeff_uv_ref, coeff_t_ref, coeff_pay_ref)``
    from an `accel.mxu.SuperleafBVH` — leaf children are then Plücker
    superleaf blocks visited on the MXU (``tris_ref``/``rows_per_leaf``/
    ``max_leaf`` unused).
    """
    K = pops_per_iter
    if K > 1 and dummy_row is None:
        raise ValueError("pops_per_iter > 1 requires a dummy_row")
    def intersect(o3, d3, active, bounce=0):
        # ---- spheres first: their hits seed best_t and cull mesh subtrees
        dx = d3[0]
        st = mk.init_hit_state(dx)
        st = mk.sphere_unroll(spheres, o3, d3, st)

        leaf_visit = None
        if mxu_refs is not None:
            leaf_visit = _make_mxu_leaf_visit(
                *mxu_refs, bt_ref, tnx_ref, tny_ref, tnz_ref, mid_ref,
                o3, d3, precision=mxu_precision,
            )
        order = descent_order
        if order == "bounce":
            # static regime split (the bounce index is a Python int in
            # trace_tile's unrolled loop): coherent primary packets order
            # by mean-ray projection, scattered secondaries by
            # near-origin-first distance — no blend arithmetic at all
            order = "dir" if bounce == 0 else "dist"
        run_packet_traversal(
            pairs_ref, tris_ref, stack_ref,
            bt_ref, tnx_ref, tny_ref, tnz_ref, mid_ref,
            o3, d3, active, st["best_t"],
            root=root, rows_per_leaf=rows_per_leaf, max_leaf=max_leaf,
            pops_per_iter=pops_per_iter, dummy_row=dummy_row,
            leaf_visit=leaf_visit, sid_ref=sid_ref, ctr_ref=ctr_ref,
            leaf_dtype=leaf_dtype, leaf_broadcast=leaf_broadcast,
            leaf_gate=leaf_gate, leaf_form=leaf_form,
            slab_dtype=slab_dtype,
            defer_leaves=defer_leaves, descent_order=order,
            primary=(bounce == 0),
        )

        # ---- resolve traversal registers into the shared hit-state shape
        t_all = bt_ref[:]
        mid = mid_ref[:]
        tri_hit = mid >= 0.0
        st["best_t"] = t_all
        st["hit_is_tri"] = tri_hit
        st["tnx"] = tnx_ref[:]
        st["tny"] = tny_ref[:]
        st["tnz"] = tnz_ref[:]
        for m, fields in enumerate(mats):
            mk._select_mats(st, tri_hit & (mid == np.float32(m)), fields)
        return mk.finish_intersect(o3, d3, st)

    # trace_tile's bounce loop is a static unroll: advertise that this
    # provider accepts the static bounce index (bounce-resolved counters)
    intersect.wants_bounce = True
    return intersect


def _make_mxu_leaf_visit(cuv_ref, ct_ref, cpay_ref,
                         bt_ref, tnx_ref, tny_ref, tnz_ref, mid_ref,
                         o3, d3, precision=_HI):
    """Plücker superleaf block visit: the `mxu_megakernel` streaming visit
    re-anchored under the pruned pair-record traversal.

    Per popped leaf child (``ptr`` = block index), evaluates all 128
    triangles of the block against every packet ray with two MXU
    contractions + one one-hot payload matmul per (8, 128) sub-tile —
    zero per-lane gathers, zero extra vector→scalar readbacks.
    ``cnt``/``hitm`` are ignored: padding lanes have det == 0 (every hit
    condition fails), and testing co-resident triangles of other cut nodes
    is correct — they are real scene geometry (accel/mxu.py bin-packing
    note); rays whose slab test missed the child cannot hit its triangles.
    """
    ox, oy, oz = o3
    dx, dy, dz = d3
    tile_h = dx.shape[0]
    if tile_h % 8:
        raise ValueError("MXU leaf visits need tile_h % 8 == 0")
    n_sub = tile_h // 8
    SUB = 8 * TILE_W   # lanes per (8, 128) sub-tile
    LANES = tile_h * TILE_W  # lanes in the whole packet

    # Mosaic (real-chip ApplyVectorLayout) aborts on two op shapes the
    # first cut of this visit used — sliced sublane→lane reshapes
    # ((8,128) row slices cast to (1,1024)) and the dim0×dim0 lhsT
    # dot_general (Array::Slice check "limits 2 > dim 1").  Everything
    # below therefore sticks to the op vocabulary the streaming engine
    # (`mxu_megakernel._stream_blocks`) already compiles and runs on v5e:
    # FULL-tile shape casts ((tile_h,128) ↔ (1, LANES)), lane-aligned
    # column slices, explicit transpose + standard (M,K)×(K,N) dots.
    ft = lambda a: jnp.reshape(a, (1, LANES))

    # per-ray Plücker features, computed once per intersect call
    # (loop-invariant inside the traversal while_loop)
    mx = oy * dz - oz * dy
    my = oz * dx - ox * dz
    mz = ox * dy - oy * dx
    zrow = jnp.zeros((1, LANES), jnp.float32)
    fuv_full = jnp.concatenate(
        [ft(mx), ft(my), ft(mz), ft(dx), ft(dy), ft(dz), zrow, zrow],
        axis=0)
    fo1_full = jnp.concatenate(
        [ft(ox), ft(oy), ft(oz),
         zrow, zrow, zrow, zrow + 1.0, zrow], axis=0)
    iota_f = jax.lax.broadcasted_iota(
        jnp.int32, (SUPERLEAF, SUB), 0
    ).astype(jnp.float32)

    def visit(ptr, cnt, hitm):
        del cnt, hitm
        base = ptr * BLOCK_ROWS
        cuv_t = jnp.transpose(cuv_ref[pl.ds(base, BLOCK_ROWS), :])
        ct_t = jnp.transpose(ct_ref[pl.ds(base, BLOCK_ROWS), :])
        cpay = cpay_ref[pl.ds(base, BLOCK_ROWS), :]
        best_full = ft(bt_ref[:])
        tmins = []
        pays = []
        for s in range(n_sub):
            cols = slice(s * SUB, (s + 1) * SUB)  # lane-vreg aligned
            quv = jax.lax.dot_general(
                cuv_t, fuv_full[:, cols], _CD, precision=precision,
                preferred_element_type=jnp.float32,
            )
            t_num = jax.lax.dot_general(
                ct_t, fo1_full[:, cols], _CD, precision=precision,
                preferred_element_type=jnp.float32,
            )
            det = quv[0:SUPERLEAF]
            u_num = quv[SUPERLEAF : 2 * SUPERLEAF]
            v_num = quv[2 * SUPERLEAF : 3 * SUPERLEAF]
            idet = 1.0 / det  # det==0 padding -> NaN -> compares False
            uu = u_num * idet
            vv = v_num * idet
            tt = t_num * idet
            best_b = jnp.broadcast_to(best_full[:, cols], (SUPERLEAF, SUB))
            hit = (
                (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                & (tt > T_MIN) & (tt < best_b)
                & (jnp.abs(det) > 1e-12)
            )
            tcand = jnp.where(hit, tt, INF)
            tmin = jnp.min(tcand, axis=0, keepdims=True)
            win = tcand == jnp.broadcast_to(tmin, (SUPERLEAF, SUB))
            jsel = jnp.min(
                jnp.where(win, iota_f, jnp.float32(1e9)),
                axis=0, keepdims=True,
            )
            onehot = (
                iota_f == jnp.broadcast_to(jsel, (SUPERLEAF, SUB))
            ).astype(jnp.float32)
            pay = jax.lax.dot_general(
                cpay, onehot, _CD, precision=_HI,
                preferred_element_type=jnp.float32,
            )
            tmins.append(tmin)
            pays.append(pay)
        # lane-concat the per-sub-tile rows back to full-packet rows and
        # cast once per payload channel ((1,LANES)->(tile_h,128), the
        # full-tile shape-cast the streaming engine exercises)
        tile = lambda r: jnp.reshape(r, (tile_h, TILE_W))
        tmin_t = tile(jnp.concatenate(tmins, axis=1))
        # float tmin comparison instead of reshaping the i1 hit mask:
        # Mosaic cannot shape-cast i1 vectors (infer-vector-layout abort)
        imp = tmin_t < bt_ref[:]
        pay_full = jnp.concatenate(pays, axis=1)  # (8, LANES)
        bt_ref[:] = jnp.where(imp, tmin_t, bt_ref[:])
        tnx_ref[:] = jnp.where(imp, tile(pay_full[0:1]), tnx_ref[:])
        tny_ref[:] = jnp.where(imp, tile(pay_full[1:2]), tny_ref[:])
        tnz_ref[:] = jnp.where(imp, tile(pay_full[2:3]), tnz_ref[:])
        mid_ref[:] = jnp.where(imp, tile(pay_full[3:4]), mid_ref[:])

    return visit


def run_packet_traversal(
    pairs_ref, tris_ref, stack_ref,
    bt_ref, tnx_ref, tny_ref, tnz_ref, mid_ref,
    o3, d3, active, best_t0,
    *,
    root: int,
    rows_per_leaf: int,
    max_leaf: int,
    pops_per_iter: int = 1,
    dummy_row: int | None = None,
    leaf_visit=None,
    sid_ref=None,
    ctr_ref=None,
    leaf_dtype=jnp.float32,
    leaf_broadcast="extract",
    leaf_gate=False,
    leaf_form="mt",
    slab_dtype=jnp.float32,
    defer_leaves: bool = False,
    descent_order: str = "mixed",
    primary: bool = False,
):
    """The shared packet traversal loop: runs the SMEM-stack tree walk and
    leaves (best_t, triangle normal, material id) in the scratch refs.
    ``best_t0`` seeds the search radius (e.g. from a sphere pre-pass);
    lanes that beat it are triangle hits (``mid >= 0``).  Both the RGB and
    the spectral packet engines wrap this core with their own material
    resolve.

    ``sid_ref``: optional extra register tracking the winner's tri-row
    SLOT (row*8 + j as float) — the differentiable intersect hook maps it
    through ``PackedBVH.prim_map`` to the original triangle for the
    gradient-carrying hit recompute.  Only the default (row-leaf) visit
    supports it.

    ``ctr_ref``: optional SMEM (6,) int32 work counters, ACCUMULATED
    across every traversal this program runs (zero it at program start):
    [0] pop batches (while-loop iterations), [1] leaf-child visits,
    [2] internal-child pushes, [3] traversals entered.  Measured counts
    over the full spp×bounce workload — the optimization scoreboard the
    host-side primary-ray analytics could not provide.

    ``leaf_visit(ptr, cnt, hitm)``: optional replacement for the default
    VPU scalar-broadcast Möller–Trumbore leaf loop — the MXU superleaf
    engine plugs its Plücker block visit in here (``tris_ref``/
    ``rows_per_leaf``/``max_leaf`` are then unused).

    ``defer_leaves``: instead of visiting a leaf child inline at its
    parent's pop, PUSH it (encoded as ``-(2*rec + half) - 1``) and re-run
    its slab test when it pops — by then ``best_t`` has matured through
    nearer subtrees, so occluded leaves are culled before paying the
    ~10x-costlier triangle loop (lazy leaf processing, the standard
    packet-tracing refinement the inline form trades away).

    ``descent_order``: ``"mixed"`` (default) — project child centers on
    the packet's mean ray, blended with distance-to-mean-origin weighted
    by (1 - |mean dir|^2), so decohered secondary packets (mean dir ~ 0,
    origins still clustered on the scattering surface) fall back to
    near-origin-first ordering — measured +13-17% over ``"dir"`` on v5e
    (bunny 26.2→29.6, mesh5440 54.6→63.9 Mrays/s) with bitwise-identical
    images (traversal order cannot change the nearest hit).  ``"dir"`` is
    the round-≤4 pure-projection order; ``"dist"`` full-weight distance
    (A/B probe, within noise of mixed on divergent scenes).

    ``primary``: statically marks bounce-0 traversals; with ``ctr_ref``
    the leaf-visit count is additionally accumulated into slot [6]
    (bounce-resolved counters — primary vs secondary split).
    """
    K = pops_per_iter
    if K > 1 and dummy_row is None:
        raise ValueError("pops_per_iter > 1 requires a dummy_row")
    # record arity from the table width: 16 lanes = pair records, 32 =
    # quad records (BVH2→BVH4 collapse, accel.pairs.build_quad_records) —
    # every caller (RGB, spectral, the grad hook) inherits quad support
    fanout = pairs_ref.shape[1] // 8
    if fanout not in (2, 4):
        raise ValueError(f"pair table width {pairs_ref.shape[1]} is not a "
                         "pair (16) or quad (32) record layout")
    if defer_leaves and fanout != 2:
        raise ValueError("defer_leaves supports pair records only")
    if fanout * K > 64:
        raise ValueError(
            f"fanout {fanout} x pops_per_iter {K} exceeds the 64-plane "
            "two-word any-hit bitmask"
        )
    ox, oy, oz = o3
    dx, dy, dz = d3
    n_lanes = int(np.prod(dx.shape))
    inv_n = np.float32(1.0 / n_lanes)
    # the packed two-child any-hit reduce decodes count0 via
    # s - floor(s/PLANE)*PLANE, which requires count0 < PLANE strictly
    # (count0 == PLANE aliases into count1); >= switches to int32 sum
    use_int_reduce = n_lanes >= int(_PLANE)

    inv_dx = jnp.where(jnp.abs(dx) > 1e-12, 1.0 / dx, jnp.float32(1e12))
    inv_dy = jnp.where(jnp.abs(dy) > 1e-12, 1.0 / dy, jnp.float32(1e12))
    inv_dz = jnp.where(jnp.abs(dz) > 1e-12, 1.0 / dz, jnp.float32(1e12))
    # the bf16 tier runs the slab tests at bf16 too (same statistical
    # contract as the leaf math).  The subtraction (box - origin) stays
    # FP32 — rounding box coords and origin to bf16 before subtracting
    # turns the cancellation error into ~0.4% of |coordinate magnitude|
    # rather than of the slab distance, which for scenes offset from the
    # world origin can overshoot any relative pad and cull true hits
    # (round-4 advisor finding).  Only the post-subtraction product and
    # min/max chain run bf16; with exact differences the residual error
    # is bounded by bf16 rounding of tn/tf themselves, which the ~0.4%
    # relative pad at the compare covers — at worst EXTRA leaf visits,
    # never missed geometry.
    slab_bf16 = (leaf_dtype == jnp.bfloat16
                 or slab_dtype == jnp.bfloat16)
    sxo, syo, szo = ox, oy, oz
    if slab_bf16:
        sxi = inv_dx.astype(jnp.bfloat16)
        syi = inv_dy.astype(jnp.bfloat16)
        szi = inv_dz.astype(jnp.bfloat16)
    else:
        sxi, syi, szi = inv_dx, inv_dy, inv_dz

    bt_ref[:] = best_t0
    tnx_ref[:] = jnp.zeros_like(dx)
    tny_ref[:] = jnp.zeros_like(dx)
    tnz_ref[:] = jnp.zeros_like(dx)
    mid_ref[:] = jnp.full_like(dx, -1.0)
    if sid_ref is not None:
        if leaf_visit is not None:
            raise ValueError("sid_ref requires the default row-leaf visit")
        sid_ref[:] = jnp.full_like(dx, -1.0)

    # packet mean ray for the ordered-descent heuristic (6 reduces,
    # amortized over the whole traversal)
    omx = jnp.sum(ox) * inv_n
    omy = jnp.sum(oy) * inv_n
    omz = jnp.sum(oz) * inv_n
    dmx = jnp.sum(dx) * inv_n
    dmy = jnp.sum(dy) * inv_n
    dmz = jnp.sum(dz) * inv_n
    if descent_order == "mixed":
        # |mean dir|^2 of unit dirs measures packet coherence in [0,1]:
        # 1 - it weights a near-origin-first distance term that takes
        # over when directions decohere (scatter packets keep clustered
        # origins even when the direction projection is noise)
        wfar = jnp.maximum(
            1.0 - (dmx * dmx + dmy * dmy + dmz * dmz), 0.0
        )
    elif descent_order == "mixed4":
        # boosted blend weight (A/B probe): distance term dominates
        # sooner as coherence decays
        wfar = 4.0 * jnp.maximum(
            1.0 - (dmx * dmx + dmy * dmy + dmz * dmz), 0.0
        )
    elif descent_order == "dist":
        wfar = jnp.float32(1.0)  # pure near-origin-first (A/B probe)
    elif descent_order != "dir":
        raise ValueError(f"unknown descent_order {descent_order!r}")

    if leaf_visit is None:
        # The leaf Möller–Trumbore loop is the measured hot spot: the
        # round-4 in-kernel counters put leaf visits at 83-87% of total
        # runtime at ~1.4 µs per 16-triangle visit
        # (benchmarks/packet_profile.py), and the saturated unit is the
        # SCALAR core: 13 vector→scalar lane extracts per triangle (208
        # per visit) to build the broadcast constants.  Consequences:
        # * ``leaf_broadcast="matmul"`` (measured LOSER, kept for A/B):
        #   ONE MXU outer product per row (rowvᵀ ⊗ ones) materializes
        #   every constant as a sublane of a (128,128) block — constants
        #   become (1,128) slices and the scalar core never touches them.
        #   Bitwise-identical images (×1.0 under Precision.HIGHEST is
        #   exact), but 17-20% SLOWER on v5e at every tier (63.6 vs 76.4
        #   @1.6k, 30.4 vs 36.3 @5.4k, 15.4 vs 18.7 bunny): the per-use
        #   (1,128)→(32,128) sublane-broadcast ops plus the 6-pass MXU
        #   latency cost more than the extracts they replace.  (A direct
        #   (1,1)→(32,128) broadcast is rejected by Mosaic — "Broadcast
        #   in both sublanes and lanes".)
        # * NO where-guard chain around 1/det — IEEE inf/NaN propagation
        #   makes every degenerate lane fail some hit comparison (NaN
        #   compares false), so the guards bought nothing but ~6 vector
        #   ops per triangle.  Hit decisions are bit-identical.
        # * rows beyond the first are @pl.when-guarded on the leaf count
        #   (mean occupancy is ~11.3 of 16 — ~14% of leaves fit one row).
        # * optional bfloat16 math (``leaf_dtype``): measured 2× SLOWER
        #   under "extract" (doubled scalar work); kept as a flag.
        lp_bf16 = leaf_dtype == jnp.bfloat16
        lb_matmul = leaf_broadcast == "matmul"
        ones_row = jnp.ones((1, TILE_W), jnp.float32)
        if lp_bf16:
            oxl = ox.astype(jnp.bfloat16)
            oyl = oy.astype(jnp.bfloat16)
            ozl = oz.astype(jnp.bfloat16)
            dxl = dx.astype(jnp.bfloat16)
            dyl = dy.astype(jnp.bfloat16)
            dzl = dz.astype(jnp.bfloat16)
        else:
            oxl, oyl, ozl = ox, oy, oz
            dxl, dyl, dzl = dx, dy, dz

        tile_h_l = ox.shape[0]
        n_blk = tile_h_l // 8 if leaf_gate else 1
        if n_blk > 1:
            # Block gating strided-slices these values.  On the primary
            # bounce the ray origin is a BROADCAST of the camera-origin
            # scalar, so Mosaic assigns it a replicated layout — and
            # vector_extract_strided_slice on a replicated vreg array
            # SIGABRTs the compiler (Array::Slice "limits 2 vs dim 1",
            # bisected round 4).  Adding inv_dx*0.0 forces a concrete
            # per-lane layout: inv_dx is where-clamped finite, and IEEE
            # (x may be NaN) forbids the compiler folding x*0 away.
            zmix = (inv_dx * 0.0).astype(leaf_dtype)
            oxl = oxl + zmix
            oyl = oyl + zmix
            ozl = ozl + zmix
            dxl = dxl + zmix
            dyl = dyl + zmix
            dzl = dzl + zmix

        def leaf_visit(ptr, cnt, hitm):
            cnt_i = cnt.astype(jnp.int32)
            if sid_ref is not None:
                base_f = (ptr * TRIS_PER_ROW).astype(jnp.float32)
            # Mosaic cannot strided-slice i1 vectors (Array::Slice check
            # fails in vector_extract_strided_slice): in gated mode the
            # mask crosses the block boundary as float32 and each block
            # re-compares.  Bit-identical decisions (0.0/1.0 exact).
            hitf = hitm.astype(jnp.float32) if n_blk > 1 else None

            def row_visit(rr):
                rowv = tris_ref[pl.ds(ptr + rr, 1), :]  # (1, 128)
                if lb_matmul:
                    # cb[k, :] == rowv[0, k]: transpose + lane-broadcast
                    # fused into one K=1 outer product on the MXU
                    cb = jax.lax.dot_general(
                        rowv, ones_row,
                        (((0,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32,
                    )  # (128, 128)
                    cbl = cb.astype(jnp.bfloat16) if lp_bf16 else cb
                    ex = lambda i: cbl[i:i + 1, :]
                    exf = lambda i: cb[i:i + 1, :]
                elif lp_bf16:
                    # Mosaic extracts 32-bit scalars only: pull fp32
                    # lanes and cast each scalar down for the bf16 tier.
                    ex = lambda i: rowv[0, i].astype(jnp.bfloat16)
                    exf = lambda i: rowv[0, i]
                else:
                    ex = lambda i: rowv[0, i]
                    exf = lambda i: rowv[0, i]
                # constants hoisted ONCE per row (scalar-core work is
                # per-row, not per-block).  Payload is (nx, ny, nz, mat)
                # in BOTH forms; in "bw" the normal lanes double as the
                # plane-test operands (13 extracts/triangle either way).
                consts = []
                for j in range(TRIS_PER_ROW):
                    jj = rr * TRIS_PER_ROW + j
                    if jj >= max_leaf:
                        break
                    lane = TRI_STRIDE * j
                    if leaf_form == "bw":
                        geo = tuple(ex(lane + k) for k in range(12))
                        if lp_bf16:
                            pay = (exf(lane), exf(lane + 1),
                                   exf(lane + 2), exf(lane + 12))
                        else:
                            pay = (geo[0], geo[1], geo[2], exf(lane + 12))
                        consts.append((jj, geo, pay))
                    else:
                        consts.append((
                            jj,
                            tuple(ex(lane + k) for k in range(9)),
                            tuple(exf(lane + k) for k in range(9, 13)),
                        ))

                def block_visit(sl):
                    hit_t = hitm if sl == slice(None) else hitf[sl] > 0.0
                    oxb, oyb, ozb = oxl[sl], oyl[sl], ozl[sl]
                    dxb, dyb, dzb = dxl[sl], dyl[sl], dzl[sl]
                    best_l = bt_ref[sl]
                    nx_l = tnx_ref[sl]
                    ny_l = tny_ref[sl]
                    nz_l = tnz_ref[sl]
                    mid_l = mid_ref[sl]
                    if sid_ref is not None:
                        sid_l = sid_ref[sl]
                    for jj, geo, pay in consts:
                        nxc, nyc, nzc, matf = pay
                        if leaf_form == "bw":
                            # Baldwin–Weber precomputed transform
                            # (accel/pairs.py _bw_operands): plane hit +
                            # two affine barycentric evaluations — ~25%
                            # fewer VPU ops than MT.  den==0 / grazing
                            # lanes self-reject: tt -> ±inf/NaN fails
                            # tt<best_l (best_l <= 1e20) or tt>T_MIN.
                            (nbx, nby, nbz, dnc, a0, a1, a2, a3c,
                             b0, b1, b2, b3c) = geo
                            den = nbx * dxb + nby * dyb + nbz * dzb
                            num = dnc - (
                                nbx * oxb + nby * oyb + nbz * ozb
                            )
                            # hardware reciprocal + ONE Newton step
                            # instead of the fp32 divide: +5-6% whole-
                            # frame on v5e (51.1/26.4 vs 48.6/25.2
                            # Mrays/s at 5.4k/73k) with image means
                            # BIT-IDENTICAL to the exact divide; the
                            # raw approx (no Newton) is no faster and
                            # shifts means ~1e-5.  den==0 -> r0=inf ->
                            # r1=NaN -> tt=NaN still self-rejects.
                            r0 = pl.reciprocal(den, approx=True)
                            tt = num * (r0 * (2.0 - den * r0))
                            px = oxb + tt * dxb
                            py = oyb + tt * dyb
                            pz = ozb + tt * dzb
                            uu = a0 * px + a1 * py + a2 * pz + a3c
                            vv = b0 * px + b1 * py + b2 * pz + b3c
                            if lp_bf16:
                                uu = uu.astype(jnp.float32)
                                vv = vv.astype(jnp.float32)
                                tt = tt.astype(jnp.float32)
                            hit_k = (
                                (uu >= 0.0)
                                & (vv >= 0.0)
                                & (uu + vv <= 1.0)
                                & (tt > float(T_MIN))
                                & (tt < best_l)
                                & hit_t
                                & (jj < cnt_i)
                            )
                        else:
                            (v0x, v0y, v0z, e1x, e1y, e1z,
                             e2x, e2y, e2z) = geo
                            # Möller–Trumbore, same formulas as
                            # megakernel.tri_unroll (broadcast scalars)
                            pvx = dyb * e2z - dzb * e2y
                            pvy = dzb * e2x - dxb * e2z
                            pvz = dxb * e2y - dyb * e2x
                            det = e1x * pvx + e1y * pvy + e1z * pvz
                            # inf/NaN lanes self-reject below
                            inv_det = 1.0 / det
                            tvx = oxb - v0x
                            tvy = oyb - v0y
                            tvz = ozb - v0z
                            uu = (
                                tvx * pvx + tvy * pvy + tvz * pvz
                            ) * inv_det
                            qvx = tvy * e1z - tvz * e1y
                            qvy = tvz * e1x - tvx * e1z
                            qvz = tvx * e1y - tvy * e1x
                            vv = (
                                dxb * qvx + dyb * qvy + dzb * qvz
                            ) * inv_det
                            tt = (
                                e2x * qvx + e2y * qvy + e2z * qvz
                            ) * inv_det
                            if lp_bf16:
                                # v5e Mosaic has no bf16 compare: the
                                # mul/adds above stay bf16; decisions
                                # upcast to fp32
                                uu = uu.astype(jnp.float32)
                                vv = vv.astype(jnp.float32)
                                tt = tt.astype(jnp.float32)
                                det = det.astype(jnp.float32)
                            hit_k = (
                                (jnp.abs(det) > 1e-9)
                                & (uu >= 0.0)
                                & (vv >= 0.0)
                                & (uu + vv <= 1.0)
                                & (tt > float(T_MIN))
                                & (tt < best_l)
                                & hit_t
                                & (jj < cnt_i)
                            )
                        best_l = jnp.where(hit_k, tt, best_l)
                        nx_l = jnp.where(hit_k, nxc, nx_l)
                        ny_l = jnp.where(hit_k, nyc, ny_l)
                        nz_l = jnp.where(hit_k, nzc, nz_l)
                        mid_l = jnp.where(hit_k, matf, mid_l)
                        if sid_ref is not None:
                            sid_l = jnp.where(
                                hit_k, base_f + np.float32(jj), sid_l
                            )
                    bt_ref[sl] = best_l
                    tnx_ref[sl] = nx_l
                    tny_ref[sl] = ny_l
                    tnz_ref[sl] = nz_l
                    mid_ref[sl] = mid_l
                    if sid_ref is not None:
                        sid_ref[sl] = sid_l

                if n_blk == 1:
                    block_visit(slice(None))
                else:
                    # sub-packet gating: an (8,128) vreg row whose lanes
                    # all missed the child box skips the whole tri loop
                    # (bounce rays diverge — a large fraction of blocks
                    # are dead by depth 2+).  Inactive blocks would be
                    # no-ops anyway (hit_k all-false), so images are
                    # bit-identical with gating on or off.
                    for b in range(n_blk):
                        blk = slice(b * 8, b * 8 + 8)
                        any_b = jnp.max(hitf[blk]) > 0.0
                        if ctr_ref is not None:
                            ctr_ref[4] = ctr_ref[4] + any_b.astype(
                                jnp.int32)
                            ctr_ref[5] = ctr_ref[5] + 1

                        @pl.when(any_b)
                        def _blk(blk=blk):
                            block_visit(blk)

            row_visit(0)
            for rr in range(1, rows_per_leaf):

                @pl.when(cnt_i > rr * TRIS_PER_ROW)
                def _row(rr=rr):
                    row_visit(rr)

    activef = active.astype(jnp.float32)
    stack_ref[0] = np.int32(root)
    # a packet with no live lanes skips traversal entirely
    sp0 = jnp.where(jnp.any(active), 1, 0).astype(jnp.int32)
    if ctr_ref is not None:
        ctr_ref[3] = ctr_ref[3] + sp0

    def cond(sp):
        return sp > 0

    def body(sp):
        # pop up to K records; under-full batches read the dummy
        # (all-empty) record whose children can never hit or push
        ps = []
        for i in range(K):
            if K == 1:
                ps.append(stack_ref[sp - 1])
            else:
                valid = (sp - 1 - i) >= 0
                idx = jnp.maximum(sp - 1 - i, 0)
                ps.append(
                    jnp.where(valid, stack_ref[idx], np.int32(dummy_row))
                )
        sp = jnp.maximum(sp - K, 0)
        best = bt_ref[:]

        # all 2K children's slab tests as straight-line VPU code
        hits = []
        ents = []
        prjs = []
        leaf_es = []  # per entry: is this a deferred-leaf stack entry?
        recs = []     # per entry: decoded pair-row index
        for i in range(K):
            if defer_leaves:
                # leaf entries are encoded -(2*rec + half) - 1; decode
                # back to (parent record, half) for the box re-test
                e = ps[i]
                is_leaf_e = e < 0
                enc = -(e + 1)
                rec_idx = jnp.where(
                    is_leaf_e, jax.lax.shift_right_logical(enc, 1), e
                )
                half_sel = jnp.bitwise_and(enc, 1)
            else:
                is_leaf_e = None
                rec_idx = ps[i]
            leaf_es.append(is_leaf_e)
            recs.append(rec_idx)
            rec = pairs_ref[pl.ds(rec_idx, 1), :]  # (1, 8*fanout) children
            for half in range(fanout):
                b = 8 * half
                lox = rec[0, b + 0]
                loy = rec[0, b + 1]
                loz = rec[0, b + 2]
                hix = rec[0, b + 3]
                hiy = rec[0, b + 4]
                hiz = rec[0, b + 5]
                ptr = rec[0, b + 6].astype(jnp.int32)
                cnt = rec[0, b + 7]
                if slab_bf16:
                    # FP32 subtraction first (advisor fix: bf16-rounding
                    # the operands makes the cancellation error relative
                    # to |coordinate|, not to the slab distance); only
                    # the difference is cast down
                    cb = lambda v: v.astype(jnp.bfloat16)
                else:
                    cb = lambda v: v
                    bestc = best
                t0 = cb(lox - sxo) * sxi
                t1 = cb(hix - sxo) * sxi
                tn = jnp.minimum(t0, t1)
                tf = jnp.maximum(t0, t1)
                t0 = cb(loy - syo) * syi
                t1 = cb(hiy - syo) * syi
                tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                tf = jnp.minimum(tf, jnp.maximum(t0, t1))
                t0 = cb(loz - szo) * szi
                t1 = cb(hiz - szo) * szi
                tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                tf = jnp.minimum(tf, jnp.maximum(t0, t1))
                gatec = cnt > -0.5
                if defer_leaves:
                    # a deferred-leaf entry re-tests ONLY its encoded
                    # half; the sibling half is gated off (scalar AND)
                    gatec = gatec & (
                        jnp.logical_not(is_leaf_e) | (half_sel == half)
                    )
                if slab_bf16:
                    # no bf16 compare on v5e: upcast the two reduced
                    # values; ~0.4% pad covers bf16 rounding of tn/tf
                    hitm = (
                        jnp.maximum(tn.astype(jnp.float32), 0.0)
                        <= jnp.minimum(tf.astype(jnp.float32), best)
                        * 1.004 + 0.001
                    ) & gatec
                else:
                    hitm = (
                        jnp.maximum(tn, 0.0) <= jnp.minimum(tf, bestc)
                    ) & gatec
                hits.append(hitm)
                ents.append((ptr, cnt))
                prj = (
                    (0.5 * (lox + hix) - omx) * dmx
                    + (0.5 * (loy + hiy) - omy) * dmy
                    + (0.5 * (loz + hiz) - omz) * dmz
                )
                if descent_order in ("mixed", "mixed4", "dist"):
                    cx = 0.5 * (lox + hix) - omx
                    cy = 0.5 * (loy + hiy) - omy
                    cz = 0.5 * (loz + hiz) - omz
                    prj = prj + wfar * (cx * cx + cy * cy + cz * cz)
                prjs.append(prj)

        # ONE vector→scalar readback decodes all fanout*K any-hit bits
        if K == 1 and fanout == 2:
            if use_int_reduce:
                packed_i = (
                    hits[0].astype(jnp.int32)
                    + (hits[1].astype(jnp.int32) << 16)
                ) * active.astype(jnp.int32)
                si = jnp.sum(packed_i)
                anyhits = ((si & 0xFFFF) > 0, (si >> 16) > 0)
            else:
                packed = (
                    hits[0].astype(jnp.float32)
                    + hits[1].astype(jnp.float32) * _PLANE
                ) * activef
                s = jnp.sum(packed)
                c1 = jnp.floor(s * np.float32(1.0 / float(_PLANE)))
                anyhits = ((s - c1 * _PLANE) > 0.5, c1 > 0.5)
        else:
            # bitmask OR-tree: per-lane masks folded across lanes and
            # sublanes with rolls — 32 bit planes per int32 word, one
            # scalar extract per word per batch (two words at K=32)
            n_planes = fanout * K
            words = []
            for g0 in range(0, n_planes, 32):
                m = hits[g0].astype(jnp.int32)
                for j in range(g0 + 1, min(g0 + 32, n_planes)):
                    m = m + (hits[j].astype(jnp.int32) << (j - g0))
                m = jnp.where(active, m, 0)
                for sh in (64, 32, 16, 8, 4, 2, 1):
                    m = m | pltpu.roll(m, sh, 1)
                sh = dx.shape[0] // 2
                while sh >= 1:
                    m = m | pltpu.roll(m, sh, 0)
                    sh //= 2
                words.append(m[0, 0])
            anyhits = tuple(
                ((words[j // 32] >> (j % 32)) & 1) > 0
                for j in range(n_planes)
            )

        def _visitable(h):
            cond = anyhits[h] & (ents[h][1] > 0.5)
            if defer_leaves:
                # only deferred-leaf entries visit; leaf children of
                # internal entries are pushed for a later re-test
                cond = cond & leaf_es[h // fanout]
            return cond

        if ctr_ref is not None:
            ctr_ref[0] = ctr_ref[0] + 1
            n_leaf = jnp.int32(0)
            for half in range(fanout * K):
                n_leaf = n_leaf + _visitable(half).astype(jnp.int32)
            ctr_ref[1] = ctr_ref[1] + n_leaf
            if primary:
                ctr_ref[6] = ctr_ref[6] + n_leaf
            if defer_leaves:
                # re-tests whose matured best_t culled the whole visit
                n_cull = jnp.int32(0)
                for i in range(K):
                    n_cull = n_cull + (
                        leaf_es[i]
                        & jnp.logical_not(
                            anyhits[2 * i] | anyhits[2 * i + 1]
                        )
                    ).astype(jnp.int32)
                ctr_ref[7] = ctr_ref[7] + n_cull

        for half in range(fanout * K):
            ptr, cnt = ents[half]
            hitm = hits[half] & active

            @pl.when(_visitable(half))
            def _leaf(ptr=ptr, cnt=cnt, hitm=hitm):
                leaf_visit(ptr, cnt, hitm)

        # ordered descent: push the far child first so the near one pops
        # first and shrinks best_t before the far subtree runs.  Records
        # push in reverse batch order so record 0's near child ends on
        # top of the stack (approximate DFS order across a batch)
        def pair_order(c0, c1, le=None):
            """(far, near) (value, push) muxes for a sibling pair."""
            cnt0, cnt1 = ents[c0][1], ents[c1][1]
            if defer_leaves:
                not_le = jnp.logical_not(le)
                push0 = anyhits[c0] & not_le & (cnt0 > -0.5)
                push1 = anyhits[c1] & not_le & (cnt1 > -0.5)
                val0 = jnp.where(
                    cnt0 > 0.5, -(2 * recs[c0 // 2] + 0) - 1, ents[c0][0]
                )
                val1 = jnp.where(
                    cnt1 > 0.5, -(2 * recs[c1 // 2] + 1) - 1, ents[c1][0]
                )
            else:
                push0 = anyhits[c0] & (cnt0 == 0.0)
                push1 = anyhits[c1] & (cnt1 == 0.0)
                val0, val1 = ents[c0][0], ents[c1][0]
            near0 = prjs[c0] <= prjs[c1]
            far = (jnp.where(near0, val1, val0),
                   jnp.where(near0, push1, push0))
            near = (jnp.where(near0, val0, val1),
                    jnp.where(near0, push0, push1))
            return far, near

        def do_push(sp, val, push):
            stack_ref[jnp.where(push, sp, _DISCARD)] = val
            if ctr_ref is not None:
                ctr_ref[2] = ctr_ref[2] + push.astype(jnp.int32)
            return sp + push.astype(jnp.int32)

        for i in reversed(range(K)):
            if fanout == 2:
                far, near = pair_order(
                    2 * i, 2 * i + 1, leaf_es[i] if defer_leaves else None
                )
                sp = do_push(sp, *far)
                sp = do_push(sp, *near)
            else:
                # quad record: two sibling groups; the farther group (by
                # min projection) pushes first so the nearer group's
                # children pop first — approximate near-first DFS
                base = fanout * i
                fa, na = pair_order(base, base + 1)
                fb, nb = pair_order(base + 2, base + 3)
                ga = jnp.minimum(prjs[base], prjs[base + 1])
                gb = jnp.minimum(prjs[base + 2], prjs[base + 3])
                a_near = ga <= gb

                def mux(p, q):
                    return (jnp.where(a_near, p[0], q[0]),
                            jnp.where(a_near, p[1], q[1]))

                sp = do_push(sp, *mux(fb, fa))  # far group, far child
                sp = do_push(sp, *mux(nb, na))
                sp = do_push(sp, *mux(fa, fb))  # near group, far child
                sp = do_push(sp, *mux(na, nb))
        return sp

    jax.lax.while_loop(cond, body, sp0)


def _kernel(
    seed_ref, off_ref, cam_ref, mat_ref, sph_ref, pairs_ref, *rest,
    spp, max_depth, width, height, n_spheres, n_mats, root,
    rows_per_leaf, max_leaf, inclusive_uv, tile_h, pops_per_iter, dummy_row,
    has_lens=False, normalize=True, use_mxu=False, mxu_precision="highest",
    counters=False, leaf_precision="fp32", leaf_broadcast="extract",
    leaf_gate=False, leaf_form="mt", slab_precision="fp32",
    defer_leaves=False, descent_order="mixed",
):
    ctr_ref = out_ctr = None
    if counters:
        if use_mxu:
            raise ValueError("counters mode supports the row engine only")
        # arg order: inputs..., outputs (rgb + ctr), scratch (.. + ctr)
        *rest, ctr_ref = rest
        rest = list(rest)
        out_ctr = rest.pop(4)  # after (tris, out_r, out_g, out_b)
    if use_mxu:
        (cuv_ref, ct_ref, cpay_ref, out_r, out_g, out_b,
         stack_ref, bt_ref, tnx_ref, tny_ref, tnz_ref, mid_ref) = rest
        tris_ref = None
        mxu_refs = (cuv_ref, ct_ref, cpay_ref)
    else:
        (tris_ref, out_r, out_g, out_b,
         stack_ref, bt_ref, tnx_ref, tny_ref, tnz_ref, mid_ref) = rest
        mxu_refs = None
    if ctr_ref is not None:
        for k in range(8):
            ctr_ref[k] = jnp.int32(0)
    i = pl.program_id(0)
    j = pl.program_id(1)
    # off_ref = (row_start, sample_offset): nonzero under row-range /
    # spp-sharded rendering (bvh_rows); PCG counters key on the absolute
    # pixel id and sample index, so images are sharding-invariant
    row = (
        i * tile_h + off_ref[0, 0]
        + jax.lax.broadcasted_iota(jnp.int32, (tile_h, TILE_W), 0)
    )
    col = j * TILE_W + jax.lax.broadcasted_iota(jnp.int32, (tile_h, TILE_W), 1)
    cam = mk.cam_tuple(cam_ref, has_lens)
    spheres = [
        tuple(sph_ref[k, f] for f in range(14)) for k in range(n_spheres)
    ]
    mats = [
        tuple(mat_ref[m, f] for f in range(N_MAT_FIELDS))
        for m in range(n_mats)
    ]
    intersect = make_packet_intersect(
        pairs_ref, tris_ref, stack_ref,
        bt_ref, tnx_ref, tny_ref, tnz_ref, mid_ref,
        spheres, mats,
        root=root, rows_per_leaf=rows_per_leaf, max_leaf=max_leaf,
        pops_per_iter=pops_per_iter, dummy_row=dummy_row,
        mxu_refs=mxu_refs,
        mxu_precision=jax.lax.Precision(mxu_precision),
        ctr_ref=ctr_ref,
        leaf_dtype=(
            jnp.bfloat16 if leaf_precision == "bf16" else jnp.float32
        ),
        leaf_broadcast=leaf_broadcast,
        leaf_gate=leaf_gate,
        leaf_form=leaf_form,
        slab_dtype=(
            jnp.bfloat16 if slab_precision == "bf16" else jnp.float32
        ),
        defer_leaves=defer_leaves,
        descent_order=descent_order,
    )
    r, g, b = mk.trace_tile(
        (row * width + col).astype(jnp.uint32),
        row.astype(jnp.float32),
        col.astype(jnp.float32),
        cam,
        spheres,
        (),
        seed=seed_ref[0, 0],
        spp=spp,
        max_depth=max_depth,
        du=np.float32(width - 1 if inclusive_uv else width),
        dv=np.float32(height - 1 if inclusive_uv else height),
        remat=False,
        intersect_fn=intersect,
        sample_offset=off_ref[0, 1],
    )
    inv = np.float32(1.0 / spp) if normalize else np.float32(1.0)
    out_r[:] = r * inv
    out_g[:] = g * inv
    out_b[:] = b * inv
    if out_ctr is not None:
        # counters land in lanes 0-3 of each tile's first row
        lane = jax.lax.broadcasted_iota(jnp.int32, (tile_h, TILE_W), 1)
        srow = jax.lax.broadcasted_iota(jnp.int32, (tile_h, TILE_W), 0)
        vals = jnp.zeros((tile_h, TILE_W), jnp.int32)
        for k in range(8):
            vals = jnp.where((srow == 0) & (lane == k), ctr_ref[k], vals)
        out_ctr[:] = vals


def _intersect_only_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, act_ref,
    pairs_ref, tris_ref,
    *rest,
    root, rows_per_leaf, max_leaf, pops_per_iter, dummy_row,
    track_prim=False, leaf_form="mt", defer_leaves=False,
    descent_order="mixed",
):
    if track_prim:
        (out_t, out_nx, out_ny, out_nz, out_mid, out_sid,
         stack_ref, bt_ref, tnx_ref, tny_ref, tnz_ref, mid_ref,
         sid_ref) = rest
    else:
        (out_t, out_nx, out_ny, out_nz, out_mid,
         stack_ref, bt_ref, tnx_ref, tny_ref, tnz_ref, mid_ref) = rest
        sid_ref = None
    intersect = make_packet_intersect(
        pairs_ref, tris_ref, stack_ref,
        bt_ref, tnx_ref, tny_ref, tnz_ref, mid_ref,
        spheres=[], mats=[],
        root=root, rows_per_leaf=rows_per_leaf, max_leaf=max_leaf,
        pops_per_iter=pops_per_iter, dummy_row=dummy_row,
        sid_ref=sid_ref, leaf_form=leaf_form,
        defer_leaves=defer_leaves, descent_order=descent_order,
    )
    o3 = (ox_ref[:], oy_ref[:], oz_ref[:])
    d3 = (dx_ref[:], dy_ref[:], dz_ref[:])
    # a packet whose lanes are ALL dead skips traversal entirely — with
    # dead-ray-clustering sort keys this is free wavefront compaction
    intersect(o3, d3, act_ref[:] > 0.5)
    # raw traversal results (pre-material-resolve) live in the scratch refs
    out_t[:] = bt_ref[:]
    out_nx[:] = tnx_ref[:]
    out_ny[:] = tny_ref[:]
    out_nz[:] = tnz_ref[:]
    out_mid[:] = mid_ref[:]
    if track_prim:
        out_sid[:] = sid_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "tile_h", "pops_per_iter", "track_prim",
                     "defer_leaves", "descent_order"),
)
def _intersect_tile_launch(packed, origins, dirs, interpret, tile_h=TILE_H,
                           pops_per_iter=1, active=None, track_prim=False,
                           defer_leaves=False, descent_order="mixed"):
    n_rows = origins.shape[0] // TILE_W
    if active is None:
        active = jnp.ones(origins.shape[0], jnp.float32)
    comps = [
        origins[:, 0], origins[:, 1], origins[:, 2],
        dirs[:, 0], dirs[:, 1], dirs[:, 2],
        active.astype(jnp.float32),
    ]
    comps = [c.reshape(n_rows, TILE_W) for c in comps]
    grid = (pl.cdiv(n_rows, tile_h),)
    pairs = _with_dummy_row(packed.pairs)
    _check_stack_depth(packed.depth, pops_per_iter, defer_leaves,
                       getattr(packed, "fanout", 2))
    kernel = functools.partial(
        _intersect_only_kernel,
        root=packed.root,
        rows_per_leaf=-(-packed.max_leaf // TRIS_PER_ROW),
        max_leaf=packed.max_leaf,
        pops_per_iter=pops_per_iter,
        dummy_row=packed.pairs.shape[0],
        track_prim=track_prim,
        leaf_form=getattr(packed, "form", "mt"),
        defer_leaves=defer_leaves,
        descent_order=descent_order,
    )
    n_out = 6 if track_prim else 5
    block = pl.BlockSpec(
        (tile_h, TILE_W), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    try:
        vma = jax.typeof(origins).vma
    except AttributeError:  # pragma: no cover - older jax
        vma = frozenset()
    if vma:
        out_shape = jax.ShapeDtypeStruct((n_rows, TILE_W), jnp.float32,
                                         vma=vma)
    else:
        out_shape = jax.ShapeDtypeStruct((n_rows, TILE_W), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(out_shape,) * n_out,
        in_specs=[block] * 7
        + [
            pl.BlockSpec(
                pairs.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                packed.tri_rows.shape, lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(block,) * n_out,
        scratch_shapes=traversal_scratch_shapes(tile_h, track_prim),
        interpret=interpret,
    )(*comps, pairs, packed.tri_rows)
    return [o.reshape(-1) for o in outs]


def intersect_tile(packed, origins, dirs, *, interpret=False,
                   tile_h=TILE_H, pops_per_iter=1, defer_leaves=False,
                   descent_order="mixed"):
    """Nearest-hit query through the packet kernel (testing/debug API).

    origins/dirs: (N, 3) with N a multiple of tile_h*128.  Returns
    (t, normal (N,3), mat_id) with t = INF (1e20) on miss — the direct
    analogue of `accel.traverse.intersect_bvh_stack` for differential
    testing.  ``tile_h``/``pops_per_iter`` as in the render entry point.
    """
    t, nx, ny, nz, mid = _intersect_tile_launch(
        packed, jnp.asarray(origins), jnp.asarray(dirs), interpret,
        tile_h=tile_h, pops_per_iter=pops_per_iter,
        defer_leaves=defer_leaves, descent_order=descent_order,
    )
    return t, jnp.stack([nx, ny, nz], axis=-1), mid.astype(jnp.int32)


def pack_materials_jnp(materials):
    """Traced (M, 16) material table (albedo, emission, metallic, roughness,
    ior, transmission + padding) — differentiable in every field."""
    m = materials.count
    return jnp.concatenate(
        [
            materials.albedo,
            materials.emission,
            materials.metallic[:, None],
            materials.roughness[:, None],
            materials.ior[:, None],
            materials.transmission[:, None],
            jnp.zeros((m, 6), jnp.float32),
        ],
        axis=1,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "spp", "max_depth", "n_spheres", "n_mats",
        "inclusive_uv", "interpret", "tile_h", "pops_per_iter",
        "n_rows", "normalize", "mxu_leaf", "mxu_precision", "counters",
        "leaf_precision", "leaf_broadcast", "leaf_gate", "slab_precision",
        "defer_leaves", "descent_order",
    ),
)
def _launch(
    seed_arr, off_arr, scene, camera, *, width, height, spp, max_depth,
    n_spheres, n_mats, inclusive_uv, interpret, tile_h=TILE_H,
    pops_per_iter=1, n_rows=None, normalize=True, mxu_leaf=False,
    mxu_precision="highest", counters=False, leaf_precision="fp32",
    leaf_broadcast="extract", leaf_gate=False, slab_precision="fp32",
    defer_leaves=False, descent_order="mixed",
):
    if mxu_leaf:
        # pair-record tree whose leaves are Plücker superleaf blocks
        # (accel.mxu.SuperleafBVH on scene.wide) — MXU block visits
        packed = scene.wide
        tables = (packed.coeff_uv, packed.coeff_t, packed.coeff_pay)
        max_leaf = 1  # unused: the MXU leaf visit replaces the row loop
        rows_per_leaf = 1
    else:
        packed = scene.packed
        tables = (packed.tri_rows,)
        max_leaf = packed.max_leaf
        rows_per_leaf = -(-max_leaf // TRIS_PER_ROW)
    # meta fields of the BVH pytree are concrete (part of the jit key)
    _check_stack_depth(packed.depth, pops_per_iter, defer_leaves,
                       getattr(packed, "fanout", 2))
    root = packed.root

    cam_arr = mk.pack_camera_jnp(camera)
    sph_arr = (
        mk.pack_scene_jnp(scene)
        if n_spheres > 0
        else jnp.zeros((1, 16), jnp.float32)
    )
    mat_arr = pack_materials_jnp(scene.materials)
    pairs = _with_dummy_row(packed.pairs)

    grid_h = pl.cdiv(n_rows if n_rows is not None else height, tile_h)
    grid_w = pl.cdiv(width, TILE_W)
    h_pad = grid_h * tile_h
    w_pad = grid_w * TILE_W

    kernel = functools.partial(
        _kernel,
        spp=spp, max_depth=max_depth, width=width, height=height,
        n_spheres=n_spheres, n_mats=n_mats, root=root,
        rows_per_leaf=rows_per_leaf, max_leaf=max_leaf,
        inclusive_uv=inclusive_uv, tile_h=tile_h,
        pops_per_iter=pops_per_iter, dummy_row=packed.pairs.shape[0],
        has_lens=camera.has_lens, normalize=normalize, use_mxu=mxu_leaf,
        mxu_precision=mxu_precision, counters=counters,
        leaf_precision=leaf_precision, leaf_broadcast=leaf_broadcast,
        leaf_gate=leaf_gate,
        leaf_form=getattr(packed, "form", "mt") if not mxu_leaf else "mt",
        slab_precision=slab_precision,
        defer_leaves=defer_leaves, descent_order=descent_order,
    )
    # under shard_map the outputs vary across the mesh axes the inputs do;
    # jax requires that declared on the out ShapeDtypeStructs (vma)
    try:
        vma = jax.typeof(off_arr).vma
    except AttributeError:  # pragma: no cover - older jax
        vma = frozenset()
    if vma:
        out_shape = jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32, vma=vma)
    else:
        out_shape = jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32)
    block = pl.BlockSpec(
        (tile_h, TILE_W), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    # physical VMEM: lane dims pad to 128 — (P,16) costs P*128 floats;
    # the coeff tables are already 128/384 lanes wide (exact)
    table_bytes = pairs.shape[0] * 128 * 4 + sum(
        int(np.prod(t.shape)) * 4 if t.shape[1] % 128 == 0
        else t.shape[0] * 128 * 4
        for t in tables
    )
    params = pltpu.CompilerParams(
        vmem_limit_bytes=int(table_bytes + (6 << 20)),
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    full = lambda a: pl.BlockSpec(
        a.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )
    out_shapes = (out_shape, out_shape, out_shape)
    out_specs = (block, block, block)
    scratch = traversal_scratch_shapes(tile_h)
    if counters:
        ctr_shape = (
            jax.ShapeDtypeStruct((h_pad, w_pad), jnp.int32, vma=vma)
            if vma else jax.ShapeDtypeStruct((h_pad, w_pad), jnp.int32)
        )
        out_shapes = out_shapes + (ctr_shape,)
        out_specs = out_specs + (block,)
        scratch = scratch + [pltpu.SMEM((8,), jnp.int32)]
    return pl.pallas_call(
        kernel,
        grid=(grid_h, grid_w),
        out_shape=out_shapes,
        in_specs=[
            smem,  # seed
            smem,  # (row_start, sample_offset)
            smem,  # camera
            smem,  # materials
            smem,  # spheres
            full(pairs),
        ]
        + [full(t) for t in tables],
        out_specs=out_specs,
        scratch_shapes=scratch,
        compiler_params=params,
        interpret=interpret,
    )(seed_arr, off_arr, cam_arr, mat_arr, sph_arr, pairs, *tables)


def bvh_rows(
    scene,
    camera,
    *,
    width: int,
    height: int,
    n_rows: int,
    row_start,
    sample_offset,
    spp: int,
    max_depth: int,
    seed: int,
    inclusive_uv: bool = True,
    interpret: bool = False,
    tile_h: int = 32,
    pops_per_iter: int | None = None,
    mxu_leaf: bool = False,
    leaf_precision: str = "fp32",
    leaf_broadcast: str = "extract",
    leaf_gate: bool = False,
    defer_leaves: bool = False,
    descent_order: str = "mixed",
):
    """Packet-BVH tracer over a row-range — the shard body of the
    tile/spp-sharded mesh renderer (the packet twin of
    ``megakernel.fused_rows``).  PCG counters key on the absolute pixel id
    and sample index, so the rendered image is sharding-invariant.

    Returns the per-row-range radiance **sum** over its spp range,
    (n_rows*width, 3).
    """
    tree = _require_tree(scene, mxu_leaf)
    if pops_per_iter is None:
        pops_per_iter = _auto_pops(tree)
    # don't pad a short shard up to a tall packet: pick the smallest legal
    # packet height covering n_rows (values are tile_h-invariant)
    while tile_h > 8 and tile_h // 2 >= n_rows:
        tile_h //= 2
    off = jnp.stack(
        [jnp.asarray(row_start, jnp.int32),
         jnp.asarray(sample_offset, jnp.int32)]
    )[None, :]
    r, g, b = _launch(
        jnp.asarray([[seed]], jnp.int32),
        off,
        scene,
        camera,
        width=width,
        height=height,
        spp=spp,
        max_depth=max_depth,
        n_spheres=scene.spheres.count,
        n_mats=scene.materials.count,
        inclusive_uv=inclusive_uv,
        interpret=interpret,
        tile_h=tile_h,
        pops_per_iter=pops_per_iter,
        n_rows=n_rows,
        normalize=False,
        mxu_leaf=mxu_leaf,
        leaf_precision=leaf_precision,
        leaf_broadcast=leaf_broadcast,
        leaf_gate=leaf_gate,
        defer_leaves=defer_leaves,
        descent_order=descent_order,
    )
    return mk._crop_flat(r, g, b, width, n_rows)


def _require_tree(scene, mxu_leaf: bool):
    """The traversal tree the engine variant reads: ``scene.packed``
    (PackedBVH, VPU row leaves) or ``scene.wide`` (SuperleafBVH, MXU
    block leaves)."""
    if mxu_leaf:
        tree = scene.wide
        if tree is None or not hasattr(tree, "pairs"):
            raise ValueError(
                "mxu_leaf=True needs a SuperleafBVH on scene.wide; call "
                "spira_tpu.accel.mxu.attach_superleaf"
            )
        return tree
    if scene.packed is None:
        raise ValueError(
            "scene has no packed BVH; call spira_tpu.accel.pairs.attach_packed"
        )
    return scene.packed


def render_flat_bvh_megakernel(
    scene,
    camera,
    *,
    width: int,
    height: int,
    spp: int = 16,
    max_depth: int = 4,
    seed: int = 0,
    inclusive_uv: bool = True,
    interpret: bool = False,
    tile_h: int = 32,
    pops_per_iter: int | None = None,
    mxu_leaf: bool = False,
    mxu_precision: str = "highest",
    leaf_precision: str = "fp32",
    leaf_broadcast: str = "extract",
    leaf_gate: bool = False,
    slab_precision: str = "fp32",
    defer_leaves: bool = False,
    descent_order: str = "mixed",
):
    """Pallas packet-BVH render → flat (H*W, 3) bottom-up HDR buffer.

    Requires ``scene.packed`` (see :func:`spira_tpu.accel.pairs.pack_bvh` /
    ``attach_packed``).  Same estimator family and PCG RNG stream as the
    sphere megakernel — a mesh-free scene renders bit-identically on either.

    ``tile_h``: packet height — (tile_h, 128) pixels traverse together.
    Taller packets amortize the per-pop vector→scalar round trip (the
    measured bottleneck) over more rays at slightly worse cull rates;
    32 measured fastest on v5e for both 1.6k- and 73k-triangle scenes.

    ``mxu_leaf``: traverse the SuperleafBVH on ``scene.wide`` instead —
    the same pruned pair-record walk, but each leaf is a 128-triangle
    Plücker block intersected on the MXU (``accel.mxu.attach_superleaf``).
    Fewer, fatter leaves → a shallower tree with fewer vector→scalar pops.

    ``mxu_precision``: MXU pass count for the Plücker contractions —
    "highest" (6 bf16 passes, fp32-exact) or "default" (1 pass,
    bf16-rounded inputs); Mosaic rejects Precision.HIGH (3 passes).
    The lower tier trades leaf-test precision (u/v edge decisions,
    t depth ordering ~1e-3 relative) for MXU time.
    """
    tree = _require_tree(scene, mxu_leaf)
    if tile_h not in (8, 16, 32, 64):
        # the any-hit OR-fold and the (8,128) sublane tiling require a
        # power-of-two packet height
        raise ValueError(f"tile_h must be one of 8/16/32/64, got {tile_h}")
    if pops_per_iter is None:
        pops_per_iter = _auto_pops(tree)
    r, g, b = _launch(
        jnp.asarray([[seed]], jnp.int32),
        jnp.zeros((1, 2), jnp.int32),
        scene,
        camera,
        width=width,
        height=height,
        spp=spp,
        max_depth=max_depth,
        n_spheres=scene.spheres.count,
        n_mats=scene.materials.count,
        inclusive_uv=inclusive_uv,
        interpret=interpret,
        tile_h=tile_h,
        pops_per_iter=pops_per_iter,
        mxu_leaf=mxu_leaf,
        mxu_precision=mxu_precision,
        leaf_precision=leaf_precision,
        leaf_broadcast=leaf_broadcast,
        leaf_gate=leaf_gate,
        slab_precision=slab_precision,
        defer_leaves=defer_leaves,
        descent_order=descent_order,
    )
    return mk._crop_flat(r, g, b, width, height)


def render_bvh_with_counters(
    scene,
    camera,
    *,
    width: int,
    height: int,
    spp: int = 16,
    max_depth: int = 4,
    seed: int = 0,
    inclusive_uv: bool = True,
    interpret: bool = False,
    tile_h: int = 32,
    pops_per_iter: int | None = None,
    leaf_gate: bool = False,
    defer_leaves: bool = False,
    descent_order: str = "mixed",
):
    """The packet render plus its measured work counters.

    Returns ``(flat_rgb, counters)`` where counters is a dict of totals
    over the whole dispatch (all tiles × spp × bounces): ``pop_batches``,
    ``leaf_visits``, ``pushes``, ``traversals``, plus the bounce-resolved
    ``leaf_visits_primary`` (bounce-0 share; secondary = total − primary)
    and, under ``defer_leaves``, ``leaf_retests_culled`` (deferred visits
    the matured best_t killed).  The optimization scoreboard for the
    mesh-throughput work: with per-op costs, time ≈ pop_batches·c_pop +
    leaf_visits·c_leaf, fit across scenes/configs.  Counter collection
    adds only scalar-unit work (a few SMEM adds per pop batch);
    throughput impact is ~noise, but use the plain entry point for
    benchmarking numbers.
    """
    tree = _require_tree(scene, False)
    if pops_per_iter is None:
        pops_per_iter = _auto_pops(tree)
    r, g, b, ctr = _launch(
        jnp.asarray([[seed]], jnp.int32),
        jnp.zeros((1, 2), jnp.int32),
        scene,
        camera,
        width=width,
        height=height,
        spp=spp,
        max_depth=max_depth,
        n_spheres=scene.spheres.count,
        n_mats=scene.materials.count,
        inclusive_uv=inclusive_uv,
        interpret=interpret,
        tile_h=tile_h,
        pops_per_iter=pops_per_iter,
        counters=True,
        leaf_gate=leaf_gate,
        defer_leaves=defer_leaves,
        descent_order=descent_order,
    )
    c = np.asarray(ctr)
    names = ("pop_batches", "leaf_visits", "pushes", "traversals",
             "leaf_blocks_run", "leaf_blocks_total",
             "leaf_visits_primary", "leaf_retests_culled")
    totals = {
        name: int(c[::tile_h, k::TILE_W].sum())
        for k, name in enumerate(names)
    }
    return mk._crop_flat(r, g, b, width, height), totals


@functools.lru_cache(maxsize=32)
def make_sorted_tile_intersect(
    *,
    interpret: bool = False,
    tile_h: int = 32,
    pops_per_iter: int | None = None,
    sort: bool = True,
    grad: bool = False,
):
    """Build the ``intersect_fn`` for the sorted bounce-wavefront engine.
    Cached per config: callers hold the fn in jit static args, so a fresh
    closure per call would force a full recompile of every program that
    closes over it.

    The packet kernel's weakness is post-bounce ray divergence: scattered
    rays in one pixel tile point everywhere, so packet best_t culling
    collapses.  This provider re-groups the wavefront every bounce —
    stable-sort by (dead, direction octant) — before handing (128·tile_h)-
    ray packets to the traversal:

    * direction-coherent packets restore the culling rate (classic
      wavefront ray sorting; the reference has no analogue — its
      megakernel simply eats the divergence thread-per-pixel);
    * dead rays cluster into packets whose traversal is SKIPPED outright
      (the kernel's any-active gate) — free compaction without compaction.

    Returns ``intersect(scene, o, d, alive) -> Hit``; plugs into
    ``integrator.path_trace.trace(intersect_fn=...)``.

    ``grad=False`` (default): forward-only — the Hit carries the kernel's
    raw traversal outputs.  ``grad=True``: the DIFFERENTIABLE hook — the
    kernel additionally reports the winning tri-row slot; the slot maps
    through ``PackedBVH.prim_map`` to the original triangle, whose hit is
    recomputed differentiably (`accel.traverse._winner_triangle_hit`), so
    camera/geometry/material gradients flow while traversal itself stays a
    stop-gradient Pallas kernel.  This is the mesh hybrid's backward
    intersect: the estimator's VJP replays paths at packet-traversal
    speed instead of the pure-XLA stackless walk.
    """
    from ..integrator.intersect import (
        Hit,
        intersect_spheres,
        merge_hits,
    )

    def intersect(scene, o, d, alive):
        packed = scene.packed
        if packed is None:
            raise ValueError(
                "sorted wavefront engine requires a packed BVH "
                "(spira_tpu.accel.pairs.attach_packed)"
            )
        pops = (
            pops_per_iter if pops_per_iter is not None
            else _auto_pops(packed)
        )
        n = o.shape[0]
        if sort:
            octant = (
                (d[:, 0] < 0).astype(jnp.int32)
                + 2 * (d[:, 1] < 0).astype(jnp.int32)
                + 4 * (d[:, 2] < 0).astype(jnp.int32)
            )
            key = jnp.where(alive, octant, 8)
            order = jnp.argsort(key, stable=True)
        else:
            order = jnp.arange(n)
        o_s = o[order]
        d_s = d[order]
        act_s = alive[order].astype(jnp.float32)

        pad = (-n) % (tile_h * TILE_W)
        if pad:
            o_s = jnp.concatenate([o_s, jnp.zeros((pad, 3), o_s.dtype)])
            d_s = jnp.concatenate(
                [d_s, jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], d_s.dtype),
                               (pad, 1))]
            )
            act_s = jnp.concatenate([act_s, jnp.zeros(pad, jnp.float32)])

        if grad:
            from ..accel.traverse import _winner_triangle_hit

            if packed.prim_map is None:
                raise ValueError(
                    "grad-mode packet intersect needs PackedBVH.prim_map "
                    "(slot -> original triangle); re-pack the scene with "
                    "spira_tpu.accel.pairs.attach_packed — pre-round-4 "
                    "pickled PackedBVH objects lack it"
                )
            # stop_gradient on EVERY kernel input (incl. the packed tables,
            # which are float leaves of the differentiated scene pytree):
            # pallas_call has no JVP rule; traversal is a discrete choice
            outs = _intersect_tile_launch(
                jax.lax.stop_gradient(packed), jax.lax.stop_gradient(o_s),
                jax.lax.stop_gradient(d_s), interpret, tile_h=tile_h,
                pops_per_iter=pops,
                active=jax.lax.stop_gradient(act_s), track_prim=True,
            )
            inv = jnp.argsort(order)
            t, sid = outs[0][inv], outs[5][inv]
            slot = jnp.clip(sid.astype(jnp.int32), 0,
                            packed.prim_map.shape[0] - 1)
            prim = jnp.maximum(packed.prim_map[slot], 0)
            tri_hit = (t < 1e19) & (sid >= 0.0)
            # gradient-carrying recompute against the winner triangle:
            # t/normal/material re-derived from the differentiable
            # triangle tables and the (differentiable) original rays
            tri = _winner_triangle_hit(scene.triangles, prim, tri_hit, o, d)
            sph = intersect_spheres(scene.spheres, o, d)
            return merge_hits(sph, tri)

        t, nx, ny, nz, mid = _intersect_tile_launch(
            packed, o_s, d_s, interpret, tile_h=tile_h,
            pops_per_iter=pops, active=act_s,
        )
        inv = jnp.argsort(order)  # position of original ray i in the sort
        t = t[inv]
        normal = jnp.stack([nx[inv], ny[inv], nz[inv]], axis=-1)
        mid = mid[inv].astype(jnp.int32)
        tri_hit = t < 1e19
        tri = Hit(
            t=jnp.where(tri_hit, t, INF),
            normal=normal,
            material=jnp.maximum(mid, 0),
            hit=tri_hit,
        )
        sph = intersect_spheres(scene.spheres, o, d)
        return merge_hits(sph, tri)

    return intersect
