"""Spectral packet-BVH Pallas megakernel: hero-wavelength transport over
arbitrary triangle meshes in ONE kernel dispatch.

Composes the two engines that already exist:

* the packet traversal core (`bvh_megakernel.run_packet_traversal`) — the
  SMEM-stack tree walk whose box/leaf tests are full-tile VPU ops — supplies
  the nearest triangle (t, normal, material id);
* the spectral tracer (`spectral_fused.trace_tile_spectral`) — Chebyshev
  SPDs, hero-wavelength lanes, dispersion — consumes it through its
  ``intersect_fn`` hook, exactly as the RGB packet engine plugs into
  ``megakernel.trace_tile``.

This removes the round-2 limitation that spectral scenes with more than
``FUSED_TRI_LIMIT`` triangles silently fell back to the wavefront path
(spectral Cornell-with-mesh / spectral bunny now run fused; reference
behavior: the megakernel BVH traversal of
/root/reference/examples/julia-raytracer-optimized.jl:1710-1830 combined
with the spectral capability BASELINE.json adds).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import colorimetry as cl
from . import megakernel as mk
from . import spectral_fused as sf
from .bvh_megakernel import (
    TILE_W,
    _check_stack_depth,
    _with_dummy_row,
    run_packet_traversal,
    traversal_scratch_shapes,
)
from .megakernel import INF, _select
from .spectral_fused import D, N_SPH_SPEC

#: spectral material record: metal, rough, ior, trans, cauchy_b,
#: alb_cheb[D], emi_cheb[D]
N_MAT_SPEC = 5 + 2 * D


def pack_materials_spectral_jnp(materials):
    """Traced (M, 5+2D) spectral material table, indexed by the material
    ids the packed BVH stores per triangle.  Differentiable in every field
    (the Chebyshev fit is a fixed linear map — see
    ``spectral_fused._CHEB_PINV``)."""
    pinv = jnp.asarray(sf._CHEB_PINV)
    alb = jnp.einsum("dk,mk->md", pinv, materials.albedo_spd)
    emi = jnp.einsum("dk,mk->md", pinv, materials.emission_spd)
    cauchy = (
        materials.cauchy_b
        if materials.cauchy_b is not None
        else materials.ior * 0.0
    )
    return jnp.concatenate(
        [
            materials.metallic[:, None],
            materials.roughness[:, None],
            materials.ior[:, None],
            materials.transmission[:, None],
            cauchy[:, None],
            alb,
            emi,
        ],
        axis=1,
    )


def make_packet_intersect_spectral(
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
    leaf_form="mt",
):
    """Build the ``intersect_fn`` plugged into ``trace_tile_spectral``.

    ``spheres``: list of spectral sphere tuples (``N_SPH_SPEC`` scalars,
    static unroll — their hits seed best_t and cull mesh subtrees);
    ``mats``: list of ``N_MAT_SPEC``-scalar spectral material tuples
    indexed by the per-triangle material id selected during traversal.
    """
    brute_spheres = sf.make_brute_intersect_spectral(spheres, ())

    def intersect(o3, d3, active):
        hit_s, t_s, (snx, sny, snz), smats_s = brute_spheres(o3, d3, active)
        best_t0 = jnp.where(hit_s, t_s, INF)

        run_packet_traversal(
            pairs_ref, tris_ref, stack_ref,
            bt_ref, tnx_ref, tny_ref, tnz_ref, mid_ref,
            o3, d3, active, best_t0,
            root=root, rows_per_leaf=rows_per_leaf, max_leaf=max_leaf,
            pops_per_iter=pops_per_iter, dummy_row=dummy_row,
            leaf_form=leaf_form,
        )

        t_all = bt_ref[:]
        mid = mid_ref[:]
        tri_hit = mid >= 0.0
        hit = t_all < INF
        t_safe = jnp.where(hit, t_all, 1.0)
        nx = _select(tri_hit, tnx_ref[:], snx)
        ny = _select(tri_hit, tny_ref[:], sny)
        nz = _select(tri_hit, tnz_ref[:], snz)

        (m_metal, m_rough, m_ior, m_trans, m_cauchy,
         m_alb, m_emi) = smats_s
        m_alb = list(m_alb)
        m_emi = list(m_emi)
        for m, mf in enumerate(mats):
            sel = tri_hit & (mid == np.float32(m))
            m_metal = _select(sel, mf[0], m_metal)
            m_rough = _select(sel, mf[1], m_rough)
            m_ior = _select(sel, mf[2], m_ior)
            m_trans = _select(sel, mf[3], m_trans)
            m_cauchy = _select(sel, mf[4], m_cauchy)
            m_alb = [
                _select(sel, a, cur)
                for a, cur in zip(mf[5 : 5 + D], m_alb)
            ]
            m_emi = [
                _select(sel, e, cur)
                for e, cur in zip(mf[5 + D : 5 + 2 * D], m_emi)
            ]
        smats = (
            m_metal, m_rough, m_ior, m_trans, m_cauchy,
            tuple(m_alb), tuple(m_emi),
        )
        return hit, t_safe, (nx, ny, nz), smats

    return intersect


def _kernel(
    seed_ref, cam_ref, mat_ref, sph_ref, pairs_ref, tris_ref,
    out_x, out_y, out_z,
    stack_ref, bt_ref, tnx_ref, tny_ref, tnz_ref, mid_ref,
    *, spp, max_depth, width, height, n_spheres, n_mats, root,
    rows_per_leaf, max_leaf, inclusive_uv, tile_h, pops_per_iter, dummy_row,
    has_lens=False, leaf_form="mt",
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    row = i * tile_h + jax.lax.broadcasted_iota(jnp.int32, (tile_h, TILE_W), 0)
    col = j * TILE_W + jax.lax.broadcasted_iota(jnp.int32, (tile_h, TILE_W), 1)
    cam = mk.cam_tuple(cam_ref, has_lens)
    spheres = [
        tuple(sph_ref[k, f] for f in range(N_SPH_SPEC))
        for k in range(n_spheres)
    ]
    mats = [
        tuple(mat_ref[m, f] for f in range(N_MAT_SPEC))
        for m in range(n_mats)
    ]
    intersect = make_packet_intersect_spectral(
        pairs_ref, tris_ref, stack_ref,
        bt_ref, tnx_ref, tny_ref, tnz_ref, mid_ref,
        spheres, mats,
        root=root, rows_per_leaf=rows_per_leaf, max_leaf=max_leaf,
        pops_per_iter=pops_per_iter, dummy_row=dummy_row,
        leaf_form=leaf_form,
    )
    x, y, z = sf.trace_tile_spectral(
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
        remat=False,  # forward-only Pallas kernel
        intersect_fn=intersect,
    )
    inv = np.float32(1.0 / spp)
    out_x[:] = x * inv
    out_y[:] = y * inv
    out_z[:] = z * inv


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "spp", "max_depth", "n_spheres", "n_mats",
        "inclusive_uv", "interpret", "tile_h", "pops_per_iter",
    ),
)
def _launch(
    seed_arr, scene, camera, *, width, height, spp, max_depth,
    n_spheres, n_mats, inclusive_uv, interpret, tile_h, pops_per_iter,
):
    packed = scene.packed
    _check_stack_depth(packed.depth, pops_per_iter)
    root = packed.root
    max_leaf = packed.max_leaf
    rows_per_leaf = -(-max_leaf // 8)  # ceil(max_leaf / TRIS_PER_ROW)

    cam_arr = mk.pack_camera_jnp(camera)
    sph_arr, _ = sf.pack_scene_spectral_jnp(scene)
    if n_spheres == 0:
        sph_arr = jnp.zeros((1, N_SPH_SPEC), jnp.float32)
    mat_arr = pack_materials_spectral_jnp(scene.materials)
    pairs = _with_dummy_row(packed.pairs)
    tri_rows = packed.tri_rows

    grid_h = pl.cdiv(height, tile_h)
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
        has_lens=camera.has_lens,
        leaf_form=getattr(packed, "form", "mt"),
    )
    out_shape = jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32)
    block = pl.BlockSpec(
        (tile_h, TILE_W), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    # physical VMEM: lane dims pad to 128 — (P,16) costs P*128 floats
    table_bytes = (pairs.shape[0] + tri_rows.shape[0]) * 128 * 4
    params = pltpu.CompilerParams(
        vmem_limit_bytes=int(table_bytes + (6 << 20)),
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    x, y, z = pl.pallas_call(
        kernel,
        grid=(grid_h, grid_w),
        out_shape=(out_shape, out_shape, out_shape),
        in_specs=[
            smem,  # seed
            smem,  # camera
            smem,  # spectral materials
            smem,  # spectral spheres
            pl.BlockSpec(
                pairs.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                tri_rows.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(block, block, block),
        scratch_shapes=traversal_scratch_shapes(tile_h),
        compiler_params=params,
        interpret=interpret,
    )(seed_arr, cam_arr, mat_arr, sph_arr, pairs, tri_rows)
    return cl.xyz_to_rgb(jnp.stack([x, y, z], axis=-1))


def render_flat_spectral_bvh_megakernel(
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
):
    """Spectral packet-BVH render → flat (H*W, 3) bottom-up linear-sRGB
    buffer.  Requires ``scene.packed`` (``attach_packed``); triangle count
    is unlimited.  Same spectral estimator and PCG streams as
    :func:`spectral_fused.render_flat_fused_spectral` — on scenes the
    brute engine can hold, images match to float tolerance.
    """
    if scene.packed is None:
        raise ValueError(
            "scene has no packed BVH; call spira_tpu.accel.pairs.attach_packed"
        )
    if tile_h not in (8, 16, 32, 64):
        raise ValueError(f"tile_h must be one of 8/16/32/64, got {tile_h}")
    if pops_per_iter is None:
        pops_per_iter = 8 if scene.packed.pairs.shape[0] >= 512 else 1
    rgb = _launch(
        jnp.asarray([[seed]], jnp.int32),
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
    )
    img = rgb[:height, :width]
    return jnp.reshape(img, (height * width, 3))
