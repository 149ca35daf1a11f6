"""Fused forward+backward path-trace megakernel (Pallas TPU) — RETIRED
EXPERIMENT.

STATUS: this kernel is a documented demonstrator, NOT the supported fast
gradient path.  It is limited to <=16 spheres (sphere scenes only) and
measured latency-bound at 154-232 Mrays/s — slower than the production
route.  The ONE supported fast differentiable step is
``megakernel.render_flat_hybrid_grad`` (Pallas forward + fused-XLA
path-replay backward via custom_vjp; bench.py headline).  Kept because the
in-kernel `jax.vjp` replay pattern (phase 2 below) is the starting point
for a future all-Pallas backward; see docs/ARCHITECTURE.md "gradient
engines".

BASELINE's north star is "forward+backward at speed-of-light per chip".
Round 1 ran backward as the fused-XLA VJP (358 Mrays/s vs the Pallas
forward's 2.9 Grays/s).  This kernel closes the gap by computing the MSE
loss AND its parameter gradients in ONE Pallas dispatch:

* phase 1 per tile: full-spp forward (`trace_tile`) -> tile radiance,
  masked MSE residual vs the target tile, loss contribution;
* phase 2: `jax.vjp` of a SINGLE sample's tracer, replayed per sample in a
  `fori_loop` — the gradient estimator is the same sum the XLA backward
  computes (loss is linear in per-sample radiance, so every sample shares
  the residual cotangent), but residuals live entirely in VMEM registers
  for one (8, 128) tile x one sample, so nothing spills to HBM.  This is
  path-replay backprop (docs/ARCHITECTURE.md) done *inside* the kernel:
  the replay seed is the PCG counter, not a stored tape.
* gradients accumulate across the (sequential) TPU grid into two small
  output tables: the 12 camera scalars and the (S, 14) sphere/material
  table — the transpose of `pack_scene_jnp`'s gather then routes them to
  Materials/Spheres pytree leaves outside the kernel.

Total cost ~= 3x the forward kernel, all on-chip.  Sphere scenes (the
differentiable flagship + BASELINE config 4); mesh gradients stay on the
fused-XLA engine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import megakernel as mk

TILE_H = mk.TILE_H
TILE_W = mk.TILE_W
MAX_SPHERES = 16  # gradient-table rows; static assert in the launcher
N_SPH_FIELDS = 14
N_CAM_FIELDS = 12


def _grad_kernel(
    seed_ref, cam_ref, sph_ref, tr_ref, tg_ref, tb_ref,
    loss_ref, dcam_ref, dsph_ref,
    *, spp, grad_spp, max_depth, width, height, n_spheres, inclusive_uv,
):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _init():
        # the grad tables live in SMEM (scalar stores to VMEM don't lower);
        # zero them with unrolled scalar stores
        zero = jnp.float32(0.0)
        loss_ref[0, 0] = zero
        for k in range(N_CAM_FIELDS):
            dcam_ref[0, k] = zero
        for k in range(MAX_SPHERES):
            for f in range(N_SPH_FIELDS):
                dsph_ref[k, f] = zero

    row = i * TILE_H + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    col = j * TILE_W + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
    pixel = (row * width + col).astype(jnp.uint32)
    row_f = row.astype(jnp.float32)
    col_f = col.astype(jnp.float32)
    du = np.float32(width - 1 if inclusive_uv else width)
    dv = np.float32(height - 1 if inclusive_uv else height)
    seed = seed_ref[0, 0]

    cam = tuple(cam_ref[0, k] for k in range(N_CAM_FIELDS))
    spheres = tuple(
        tuple(sph_ref[k, f] for f in range(N_SPH_FIELDS))
        for k in range(n_spheres)
    )
    prims = (cam, spheres)
    # Params lifted to (8, 128) tiles: the per-sample VJP then keeps every
    # cotangent vector-valued — zero cross-lane reduces inside the sample
    # loop (a scalar param's cotangent is a sum-reduce per sample per param;
    # measured 5x slower).  One reduce per param per TILE at the end.
    ones = jnp.ones_like(row_f)
    prims_vec = (
        tuple(c * ones for c in cam),
        tuple(tuple(f * ones for f in sph) for sph in spheres),
    )

    def fwd(p, sample_offset, nspp):
        c, s = p
        return mk.trace_tile(
            pixel, row_f, col_f, c, list(s), (),
            seed=seed, spp=nspp, max_depth=max_depth, du=du, dv=dv,
            remat=False, sample_offset=sample_offset,
        )

    # ---- phase 1: full forward, masked MSE residual
    # loss = mean over every (pixel, channel) element — jnp.mean semantics
    inv_spp = np.float32(1.0 / spp)
    inv_nelem = np.float32(1.0 / (width * height * 3))
    sr, sg, sb = fwd(prims, 0, spp)
    maskf = ((row < height) & (col < width)).astype(jnp.float32)
    resr = (sr * inv_spp - tr_ref[:]) * maskf
    resg = (sg * inv_spp - tg_ref[:]) * maskf
    resb = (sb * inv_spp - tb_ref[:]) * maskf
    tile_loss = (
        jnp.sum(resr * resr) + jnp.sum(resg * resg) + jnp.sum(resb * resb)
    ) * inv_nelem
    loss_ref[0, 0] = loss_ref[0, 0] + tile_loss

    # dL/d(per-sample radiance sum): shared by every sample (linear loss).
    # grad_spp < spp replays only the first grad_spp samples and rescales —
    # an unbiased stochastic-gradient estimator (forward stays full-spp).
    two = np.float32(2.0)
    scale = inv_nelem * inv_spp * np.float32(spp / grad_spp)
    gr = two * resr * scale
    gg = two * resg * scale
    gb = two * resb * scale

    # ---- phase 2: per-sample VJP replay, vector grads in the loop carry
    def body(s, carry):
        gcam, gsph = carry
        _, vjp_fn = jax.vjp(lambda p: fwd(p, s, 1), prims_vec)
        (dc, ds), = vjp_fn((gr, gg, gb))
        gcam = tuple(a + b for a, b in zip(gcam, dc))
        gsph = tuple(
            tuple(a + b for a, b in zip(row_g, drow))
            for row_g, drow in zip(gsph, ds)
        )
        return gcam, gsph

    zero = jnp.zeros_like(row_f)
    init = (
        tuple(zero for _ in range(N_CAM_FIELDS)),
        tuple(tuple(zero for _ in range(N_SPH_FIELDS))
              for _ in range(n_spheres)),
    )
    gcam, gsph = jax.lax.fori_loop(0, grad_spp, body, init)

    for k in range(N_CAM_FIELDS):
        dcam_ref[0, k] = dcam_ref[0, k] + jnp.sum(gcam[k])
    for k in range(n_spheres):
        for f in range(N_SPH_FIELDS):
            dsph_ref[k, f] = dsph_ref[k, f] + jnp.sum(gsph[k][f])


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "spp", "grad_spp", "max_depth", "n_spheres",
        "inclusive_uv", "interpret",
    ),
)
def _grad_launch(
    seed_arr, scene, camera, target, *, width, height, spp, grad_spp,
    max_depth, n_spheres, inclusive_uv, interpret,
):
    cam_arr = mk.pack_camera_jnp(camera)
    sph_arr = mk.pack_scene_jnp(scene)
    grid_h = pl.cdiv(height, TILE_H)
    grid_w = pl.cdiv(width, TILE_W)
    h_pad = grid_h * TILE_H
    w_pad = grid_w * TILE_W

    # flat (H*W, 3) bottom-up target -> padded planes
    t = jnp.reshape(target, (height, width, 3))
    planes = [
        jnp.zeros((h_pad, w_pad), jnp.float32)
        .at[:height, :width]
        .set(t[..., c])
        for c in range(3)
    ]

    kernel = functools.partial(
        _grad_kernel,
        spp=spp, grad_spp=grad_spp, max_depth=max_depth, width=width,
        height=height, n_spheres=n_spheres, inclusive_uv=inclusive_uv,
    )
    tile_block = pl.BlockSpec(
        (TILE_H, TILE_W), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    const = lambda i, j: (0, 0)  # noqa: E731
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    loss, dcam, dsph = pl.pallas_call(
        kernel,
        grid=(grid_h, grid_w),
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, N_CAM_FIELDS), jnp.float32),
            jax.ShapeDtypeStruct((MAX_SPHERES, N_SPH_FIELDS), jnp.float32),
        ),
        in_specs=[smem, smem, smem, tile_block, tile_block, tile_block],
        # grad tables are scalar-accumulated -> SMEM outputs (Mosaic does
        # not lower scalar stores to VMEM); the constant index map keeps one
        # block live across the sequential grid
        out_specs=(
            pl.BlockSpec((1, 1), const, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, N_CAM_FIELDS), const, memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (MAX_SPHERES, N_SPH_FIELDS), const, memory_space=pltpu.SMEM
            ),
        ),
        interpret=interpret,
    )(seed_arr, cam_arr, sph_arr, *planes)
    return loss[0, 0], dcam[0, :N_CAM_FIELDS], dsph[:, :N_SPH_FIELDS]


def render_mse_loss_and_grads(
    scene,
    camera,
    target_flat,
    *,
    width: int,
    height: int,
    spp: int = 16,
    grad_spp: int | None = None,
    max_depth: int = 4,
    seed: int = 0,
    inclusive_uv: bool = True,
    interpret: bool = False,
):
    """One-dispatch fwd+bwd: MSE loss vs ``target_flat`` ((H*W, 3) bottom-up
    HDR) and gradients routed to the scene/camera pytrees.

    Returns ``(loss, d_scene, d_camera)`` where d_scene carries cotangents
    for sphere centers/radii and every material field touched by spheres
    (the transpose of ``pack_scene_jnp``'s material gather), and d_camera
    for origin/lower_left_corner/horizontal/vertical.
    """
    n_spheres = scene.spheres.count
    if n_spheres == 0 or n_spheres > MAX_SPHERES:
        raise ValueError(
            f"pallas grad kernel supports 1..{MAX_SPHERES} spheres "
            f"(got {n_spheres})"
        )
    if scene.triangles.count > 0:
        raise ValueError(
            "pallas grad kernel is sphere-only; mesh gradients run on the "
            "fused-XLA engine"
        )
    loss, dcam12, dsph = _grad_launch(
        jnp.asarray([[seed]], jnp.int32),
        scene,
        camera,
        jnp.asarray(target_flat, jnp.float32),
        width=width,
        height=height,
        spp=spp,
        grad_spp=grad_spp if grad_spp is not None else spp,
        max_depth=max_depth,
        n_spheres=n_spheres,
        inclusive_uv=inclusive_uv,
        interpret=interpret,
    )

    def packer(sc, cm):
        return (
            mk.pack_scene_jnp(sc)[:, :N_SPH_FIELDS],
            jnp.concatenate(
                [cm.origin, cm.lower_left_corner, cm.horizontal, cm.vertical]
            ),
        )

    _, vjp_fn = jax.vjp(packer, scene, camera)
    d_scene, d_camera = vjp_fn((dsph[:n_spheres], dcam12))
    return loss, d_scene, d_camera
