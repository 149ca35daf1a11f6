"""The light-transport estimator: an iterative, masked, wavefront path tracer.

Reference blueprint (SURVEY.md §2.3 / §3.3): the standalone MSL megakernel
`/root/reference/src/spira_path_trace_kernel.metal:140-269` — throughput ×
albedo accumulation, per-bounce emission add, sky on miss, Russian roulette
after depth 3, 0.01 throughput cutoff.  Its per-thread ``break``s become
per-ray ``alive`` masks under a `lax.scan` over bounces: XLA wants uniform
control flow, dead lanes are simply masked (SURVEY.md §7 hard parts).  The
per-bounce device→host early-exit sync of the wavefront driver
(`/root/reference/src/spira-metal-optimized.jl:1309`, `Metal.sum` readback) is
deliberately eliminated — control never leaves the device.

``semantics="reference"`` instead reproduces `render_with_cpu`
(`/root/reference/src/spira-metal-optimized.jl:1346-1450`) exactly in
expectation: emissive hits terminate with plain emission, diffuse bounces
carry an extra 0.5, no RR, no cutoff.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import rng as srng
from ..core import vecmath as vm
from ..core.vecmath import SCATTER_EPS
from . import bsdf
from .intersect import intersect_scene

#: bounce index after which Russian roulette starts
#: (/root/reference/src/spira_path_trace_kernel.metal:246: ``depth > 3``).
RR_START = 3
RR_CAP = 0.95
THROUGHPUT_CUTOFF = 0.01


def trace(
    scene,
    origins,
    directions,
    sample_key,
    *,
    max_depth: int,
    semantics: str = "physical",
    russian_roulette: bool = True,
    remat: bool = True,
    intersect_fn=None,
):
    """Estimate radiance for a wavefront of rays.

    Args:
      scene: Scene pytree.
      origins, directions: (N,3) primary rays (unit directions).
      sample_key: threefry key already folded with the sample index.
      max_depth: static bounce budget.
      semantics: "physical" (MSL megakernel) or "reference" (CPU fallback).
      intersect_fn: nearest-hit override ``(scene, o, d, alive) -> Hit``
        (default: :func:`intersect_scene`).  The sorted bounce-wavefront
        engine plugs the Pallas packet traversal in here.
    Returns (N,3) radiance.
    """
    # Init carries derive from the ray arrays (not fresh constants) so that
    # under shard_map they carry the same varying-over-mesh-axes type as the
    # loop body's outputs; XLA folds the no-op arithmetic.
    zeros = origins * 0.0
    init = (
        origins,
        directions,
        zeros + 1.0,  # path throughput
        zeros,  # accumulated radiance
        zeros[:, 0] < 1.0,  # alive mask (all True)
    )

    step = partial(
        _bounce,
        scene=scene,
        sample_key=sample_key,
        semantics=semantics,
        russian_roulette=russian_roulette,
        intersect_fn=intersect_fn,
    )

    body = lambda carry, b: (step(carry, b), None)
    if remat:
        # Path-replay backprop: checkpoint each bounce so reverse-mode stores
        # only the (ray, throughput, radiance, alive) carry per bounce and
        # re-traces the bounce (re-deriving its randomness from the threefry
        # counters) instead of saving intersection/scatter intermediates.
        # Without this, differentiating the nested spp×bounce scans
        # materializes an (spp, depth, n_rays, 3) residual tape — 24 GB at
        # the 640×360 spp=16 flagship config.
        body = jax.checkpoint(body)

    (_, _, _, radiance, _), _ = jax.lax.scan(body, init, jnp.arange(max_depth))
    return radiance


def _bounce(carry, bounce_idx, *, scene, sample_key, semantics,
            russian_roulette, intersect_fn=None):
    o, d, throughput, radiance, alive = carry
    n = o.shape[0]

    if intersect_fn is None:
        hit = intersect_scene(scene, o, d)
    else:
        hit = intersect_fn(scene, o, d, alive)
    mat = bsdf.gather_materials(scene.materials, hit.material)

    sky = bsdf.sky_color(d)
    miss = alive & ~hit.hit
    radiance = radiance + jnp.where(miss[:, None], throughput * sky, 0.0)

    live_hit = alive & hit.hit
    # guarded t: miss lanes carry t=INF, and inf*0 through the masked
    # branches of jnp.where still NaNs reverse-mode
    t_safe = jnp.where(hit.hit, hit.t, 1.0)
    hit_point = o + t_safe[:, None] * d

    if semantics == "physical":
        # Emission accumulates every bounce through the running throughput
        # (MSL kernel :214); path continues through emissive surfaces.
        radiance = radiance + jnp.where(
            live_hit[:, None], throughput * mat["emission"], 0.0
        )
        new_dir, attenuation = bsdf.scatter_physical(
            sample_key, bounce_idx, d, hit.normal, mat
        )
        entering = vm.dot(d, hit.normal) < 0.0
        n_ff = vm.where(entering, hit.normal, -hit.normal)
        # Offset along the side the new direction leaves from (handles
        # refraction exiting through the surface).
        going_out = vm.dot(new_dir, n_ff) >= 0.0
        offset_n = vm.where(going_out, n_ff, -n_ff)
        new_origin = hit_point + SCATTER_EPS * offset_n

        new_throughput = throughput * attenuation
        survived = live_hit

        if russian_roulette:
            # RR (MSL kernel :246-253): after bounce 3, continue with
            # p = min(max-channel(throughput), 0.95), re-weight by 1/p.
            # The continuation probability is a sampling decision, not part
            # of the estimand — detach it from the gradient.
            p_cont = jnp.clip(jnp.max(new_throughput, axis=-1), 1e-6, RR_CAP)
            p_cont = jax.lax.stop_gradient(p_cont)
            k_rr = srng.bounce_key(sample_key, bounce_idx, srng.Stream.ROULETTE)
            u_rr = srng.uniform(k_rr, (n,))
            rr_active = bounce_idx > RR_START
            rr_kill = rr_active & (u_rr > p_cont)
            new_throughput = jnp.where(
                (rr_active & ~rr_kill)[:, None],
                new_throughput / p_cont[:, None],
                new_throughput,
            )
            survived = survived & ~rr_kill
            # Throughput floor cutoff (MSL kernel :256-258).
            survived = survived & (
                jnp.max(new_throughput, axis=-1) >= THROUGHPUT_CUTOFF
            )

    elif semantics == "reference":
        # Emissive surfaces return emission outright and end the path
        # (/root/reference/src/spira-metal-optimized.jl:1392-1394).
        emissive = jnp.any(mat["emission"] > 0.0, axis=-1)
        emit_now = live_hit & emissive
        radiance = radiance + jnp.where(
            emit_now[:, None], throughput * mat["emission"], 0.0
        )
        new_dir, attenuation = bsdf.scatter_reference(
            sample_key, bounce_idx, d, hit.normal, mat
        )
        # Reference scatters from the exact hit point (Ray ctor re-normalizes
        # but applies no epsilon offset; its t_min=1e-3 plays that role).
        new_origin = hit_point
        new_throughput = throughput * attenuation
        survived = live_hit & ~emissive
    else:
        raise ValueError(f"unknown semantics: {semantics!r}")

    # Dead lanes keep their state (masked update; no compaction in v0).
    o = vm.where(survived, new_origin, o)
    d = vm.where(survived, new_dir, d)
    throughput = vm.where(survived, new_throughput, throughput)
    alive = survived

    return o, d, throughput, radiance, alive
