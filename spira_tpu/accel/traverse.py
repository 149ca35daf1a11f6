"""Vectorized, masked BVH traversal over a ray wavefront (pure XLA).

Mirrors the complete MSL traversal `hit_bvh`
(`/root/reference/examples/julia-raytracer-optimized.jl:1710-1775`): iterative
with an explicit 64-deep stack, push right-then-left, leaf → primitive tests,
nearest-hit tracking.  Instead of one scalar stack per GPU thread, every ray
in the wavefront carries a (MAX_STACK,) lane in a (N, MAX_STACK) stack array;
the loop runs while *any* ray has work (`lax.while_loop`, condition evaluated
on device — no host sync), dead rays are masked.  Divergence shows up as
masked-off lanes, the cost model SURVEY.md §7 flags as the hard part; the
Pallas kernel in `spira_tpu.kernels` is the optimized path, this is the
always-correct reference (and the gradient-capable one).

Known-broken variant to avoid: the reference's Julia-kernel traversal never
pushes the right child (`/root/reference/examples/spira-metal-raytracer.jl:606`)
— `test_bvh.py` compares exhaustively against brute force to rule that class
of bug out.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import vecmath as vm
from ..core.vecmath import INF, T_MIN
from ..integrator.intersect import Hit
from .bvh import MAX_STACK


def _slab_test(node_min, node_max, origins, inv_dir, t_max):
    """Branchless AABB slab test (the precomputed-inverse form of
    `/root/reference/examples/spira-metal-raytracer.jl:151-175`).
    All args (N,3)/(N,); returns (N,) bool."""
    t0 = (node_min - origins) * inv_dir
    t1 = (node_max - origins) * inv_dir
    tsmall = jnp.minimum(t0, t1)
    tbig = jnp.maximum(t0, t1)
    tmin = jnp.maximum(jnp.max(tsmall, axis=-1), 0.0)
    tmax = jnp.minimum(jnp.min(tbig, axis=-1), t_max)
    return tmin <= tmax


def _mt_single(v0, e1, e2, origins, directions, t_min, t_max):
    """Möller–Trumbore for one gathered triangle per ray; all (N,3)."""
    pvec = jnp.cross(directions, e2)
    det = vm.dot(e1, pvec)
    det_ok = jnp.abs(det) > 1e-12
    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    tvec = origins - v0
    u = vm.dot(tvec, pvec) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = vm.dot(directions, qvec) * inv_det
    t = vm.dot(e2, qvec) * inv_det
    valid = (
        (jnp.abs(det) > 1e-9)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_max)
    )
    return t, valid


def intersect_bvh(bvh, tris, origins, directions, t_min=T_MIN) -> Hit:
    """Nearest triangle hit per ray through the flat BVH.

    Wavefront state: per-ray stack (N, MAX_STACK+1) — the last column is a
    write-discard slot for masked pushes — stack pointer, and running
    nearest-hit registers.
    """
    n = origins.shape[0]
    leaf_size = bvh.max_leaf  # static unroll bound for leaf primitive tests
    rows = jnp.arange(n)

    inv_dir = jnp.where(
        jnp.abs(directions) > 1e-12, 1.0 / directions, jnp.float32(1e12)
    )

    zero_i = (origins[:, 0] * 0).astype(jnp.int32)  # varying-typed zeros
    stack = jnp.zeros((n, MAX_STACK + 1), jnp.int32) + zero_i[:, None]
    ptr = zero_i + 1  # root (node 0) pre-pushed at slot 0
    best_t = origins[:, 0] * 0 + INF
    best_prim = zero_i

    def cond(state):
        _, ptr, _, _ = state
        return jnp.any(ptr > 0)

    def body(state):
        stack, ptr, best_t, best_prim = state
        active = ptr > 0
        top = jnp.maximum(ptr - 1, 0)
        node = stack[rows, top]
        ptr = jnp.where(active, ptr - 1, ptr)

        nmin = bvh.node_min[node]
        nmax = bvh.node_max[node]
        box_hit = _slab_test(nmin, nmax, origins, inv_dir, best_t)
        process = active & box_hit

        node_is_leaf = bvh.is_leaf[node] == 1
        leaf = process & node_is_leaf
        first = bvh.left[node]
        count = bvh.right[node]
        n_prims = tris.count
        for j in range(leaf_size):
            prim_valid = leaf & (j < count)
            slot = jnp.clip(first + j, 0, n_prims - 1)
            prim = bvh.prim_idx[slot]
            v0 = tris.v0[prim]
            e1 = tris.e1[prim]
            e2 = tris.e2[prim]
            t, valid = _mt_single(
                v0, e1, e2, origins, directions, t_min, best_t
            )
            closer = prim_valid & valid
            best_t = jnp.where(closer, t, best_t)
            best_prim = jnp.where(closer, prim, best_prim)

        # Internal: push right then left (left popped first, like the MSL
        # traversal).  A redirect node (left == right, from the two-level
        # stitcher) pushes only once.
        internal = process & ~node_is_leaf
        left = bvh.left[node]
        right = bvh.right[node]
        push_right = internal & (left != right)

        # Masked pushes route to the write-discard column MAX_STACK.
        idx = jnp.where(push_right, ptr, MAX_STACK)
        stack = stack.at[rows, idx].set(right)
        ptr = ptr + push_right.astype(jnp.int32)

        idx = jnp.where(internal, ptr, MAX_STACK)
        stack = stack.at[rows, idx].set(left)
        ptr = ptr + internal.astype(jnp.int32)

        return stack, ptr, best_t, best_prim

    _, _, best_t, best_prim = jax.lax.while_loop(
        cond, body, (stack, ptr, best_t, best_prim)
    )

    hit = best_t < INF
    return Hit(
        t=best_t,
        normal=tris.normal[best_prim],
        material=tris.material[best_prim],
        hit=hit,
    )
