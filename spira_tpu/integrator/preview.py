"""Single-bounce preview shading — the reference's quick-look renderers.

The reference ships four single-bounce shaded renderers for fast scene
checks: direct lighting ``max(0.2, n·light_from_above)`` as an array-ops
batch (`/root/reference/examples/spira-metal-array.jl:229-397`), as a GPU
kernel (`/root/reference/examples/spira-metal-minimal.jl:199-326`), on the
CPU (`/root/reference/examples/spira-metal-simple.jl:67-144`), and a
normal-visualization shade in the Julia-kernel raytracer
(`/root/reference/examples/spira-metal-raytracer.jl:618-626`).  This module
is their single counterpart: one primary-ray intersection against the full
scene (BVH-accelerated when present) plus a closed-form shade — no bounce
loop, no RNG beyond the pixel jitter, one dispatch.

Reached through ``render(..., shading="preview")`` (headlamp-style direct
lighting × albedo) or ``shading="normal"`` (|n|→RGB visualization).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import rng as srng
from ..scene.camera import generate_rays
from .intersect import intersect_scene

#: the reference's light-from-above direction, normalized
#: (`/root/reference/examples/spira-metal-simple.jl:99`: light ∝ (1, 2, 1))
_LIGHT = (0.40824829, 0.81649658, 0.40824829)
#: ambient floor (`max(0.2, n·l)`, spira-metal-minimal.jl:246)
_AMBIENT = 0.2


@partial(
    jax.jit,
    static_argnames=("width", "height", "shading", "inclusive_uv"),
)
def render_flat_preview(
    scene,
    camera,
    *,
    width: int,
    height: int,
    seed: int = 0,
    shading: str = "preview",
    inclusive_uv: bool = True,
):
    """One-bounce shaded render → flat (H*W, 3) bottom-up buffer.

    ``shading="preview"``: albedo × max(0.2, n·l) direct lighting with the
    sky gradient on misses; ``shading="normal"``: 0.5·(n+1) normal
    visualization (the reference's raytracer-kernel shade).
    """
    key = srng.sample_key(srng.base_key(seed), 0)
    origins, dirs = generate_rays(
        camera, width, height, key, inclusive_uv=inclusive_uv
    )
    hit = intersect_scene(scene, origins, dirs)

    # face-forward the geometric normal (misses keep a harmless default)
    n = hit.normal
    sgn = jnp.where(jnp.sum(dirs * n, axis=-1, keepdims=True) < 0.0, 1.0, -1.0)
    n = n * sgn

    # sky gradient terminal, same formula as every reference renderer
    t_sky = 0.5 * (dirs[:, 1] + 1.0)
    sky = (1.0 - t_sky)[:, None] + t_sky[:, None] * jnp.asarray(
        [0.5, 0.7, 1.0], jnp.float32
    )

    if shading == "normal":
        shade = 0.5 * (n + 1.0)
    else:
        lam = jnp.maximum(
            _AMBIENT, jnp.sum(n * jnp.asarray(_LIGHT, jnp.float32), axis=-1)
        )
        albedo = scene.materials.albedo[hit.material]
        shade = albedo * lam[:, None]
    return jnp.where(hit.hit[:, None], shade, sky)
