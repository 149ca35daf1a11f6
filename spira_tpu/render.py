"""Top-level render drivers — the package-API equivalent of
`SPIRA.render` (`/root/reference/src/spira-metal-optimized.jl:1453-1490`).

Backend selection (the reference's Metal→CUDA→CPU probe chain,
`:16-279,1460-1479`) collapses to "whatever `jax.devices()` provides": one
compiled program serves TPU and CPU.  The host-side samples loop of the
reference (`:1274`) becomes an on-device `lax.scan` with an accumulator
carry — one dispatch renders the whole frame.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .core import rng as srng
from .integrator.path_trace import trace
from .io import image as img_io
from .scene.camera import generate_rays


@partial(
    jax.jit,
    static_argnames=(
        "width",
        "height",
        "spp",
        "max_depth",
        "semantics",
        "inclusive_uv",
    ),
)
def render_flat(
    scene,
    camera,
    *,
    width: int,
    height: int,
    spp: int = 16,
    max_depth: int = 4,
    seed: int = 0,
    semantics: str = "physical",
    inclusive_uv: bool = True,
):
    """Render to a flat (H*W, 3) bottom-up HDR radiance buffer (mean of spp).

    Fully on-device: `lax.scan` over samples, each sample generating and
    tracing a (H*W,) ray wavefront.
    """
    if spp < 1:
        raise ValueError(f"spp must be >= 1, got {spp}")
    base = srng.base_key(seed)
    n = width * height

    def sample_step(acc, sample_idx):
        skey = srng.sample_key(base, sample_idx)
        origins, dirs = generate_rays(
            camera, width, height, skey, inclusive_uv=inclusive_uv
        )
        radiance = trace(
            scene, origins, dirs, skey, max_depth=max_depth, semantics=semantics
        )
        return acc + radiance, None

    acc, _ = jax.lax.scan(
        sample_step, jnp.zeros((n, 3), jnp.float32), jnp.arange(spp)
    )
    return acc / jnp.float32(spp)


def render_hdr(scene, camera, width, height, **kw) -> jnp.ndarray:
    """Render to an (H, W, 3) top-down HDR image."""
    flat = render_flat(scene, camera, width=width, height=height, **kw)
    return img_io.assemble_image(flat, width, height)


def render(
    scene,
    camera,
    width: int,
    height: int,
    *,
    samples_per_pixel: int = 16,
    max_depth: int = 4,
    seed: int = 0,
    semantics: str = "physical",
    tonemap: str = "gamma",
    inclusive_uv: bool = True,
    output_path: str | None = None,
) -> np.ndarray:
    """Render, tone map, optionally save a PNG; returns (H, W, 3) uint8.

    Signature mirrors the reference package API
    (`/root/reference/src/spira-metal-optimized.jl:1453-1455`).
    """
    hdr = render_hdr(
        scene,
        camera,
        width,
        height,
        spp=samples_per_pixel,
        max_depth=max_depth,
        seed=seed,
        semantics=semantics,
        inclusive_uv=inclusive_uv,
    )
    ldr = img_io.TONEMAPS[tonemap](hdr)
    out = img_io.to_uint8(ldr)
    if output_path is not None:
        if output_path.endswith(".exr"):
            img_io.save_exr(output_path, np.asarray(hdr))
        elif output_path.endswith(".ppm"):
            img_io.save_ppm(output_path, out)
        else:
            img_io.save_png(output_path, out)
    return out
