"""Streaming MXU mesh megakernel: brute-force superleaf visits, zero syncs.

An alternative mesh engine that tests EVERY superleaf block against every
ray packet with MXU matmuls and a plain counter loop — no tree, no stack,
no vector→scalar feedback anywhere.  It exists because the round-2
traversal investigation needed the clean endpoint of the design space, and
the measurement is worth keeping (v5e, 640×360 spp16 d4):

* a 128-triangle × 1024-ray block visit costs ~5 µs and is THROUGHPUT
  bound — ~1.2 µs of MXU (the (384,8)×(8,1024) Plücker contraction at
  fp32-HIGHEST is six bf16 passes) plus ~2-3 µs of VPU epilogue
  (hit mask, column argmin, one-hot payload resolve over (128,1024));
* that is ~4-5 ns per ray-triangle pair — the same constant the packet
  kernel's scalar-broadcast Möller–Trumbore achieves on the VPU.  With
  equal per-pair cost, pruning decides: the packet-traversal kernel
  (`bvh_megakernel.py`) tests far fewer pairs and wins at every mesh size
  measured (46.5 vs 8.3 Mrays/s at 1.6k tris, tile_h=32).

Render dispatch therefore never auto-selects this engine; it stays as the
`engine="pallas_mxu"` option and as the measured baseline that bounds what
"no traversal at all" buys on this hardware.  The reference makes the
analogous trade in the opposite direction: linear scan for small scenes
(`/root/reference/src/spira_path_trace_kernel.metal:178-186`), BVH for
meshes (`/root/reference/examples/julia-raytracer-optimized.jl:1710-1775`).

Per block visit (see `accel/mxu.py` for the Plücker packing):

* ``quv = coeff_uvᵀ · F_uv`` and ``t_num = coeff_tᵀ · F_o1`` — two MXU
  contractions give det/u_num/v_num/t_num for 128 triangles × 1024 rays;
* hit mask + column argmin via an iota/one-hot compare;
* payload (normal, material id) resolved by ONE ``(8,128)×(128,1024)``
  one-hot matmul — no per-lane gathers anywhere.

All loop state (best_t and payload rows) is carried as values through a
``fori_loop`` whose trip count is static — control never touches vector
results, so every visit pipelines.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.mxu import BLOCK_ROWS, SUPERLEAF
from . import megakernel as mk

TILE_H = mk.TILE_H
TILE_W = mk.TILE_W
INF = mk.INF
T_MIN = mk.T_MIN
N_LANES = TILE_H * TILE_W  # 1024 rays per program

#: superleaf blocks visited per fori_loop iteration (static inner unroll)
CHUNK = 8

_HI = jax.lax.Precision.HIGHEST
_CD = (((1,), (0,)), ((), ()))  # contract lhs dim 1 with rhs dim 0


def _pad_blocks(packed):
    """Pad the coefficient tables to a CHUNK multiple of blocks.

    Zero blocks have det == 0 for every lane, so u/v/t evaluate to NaN/inf
    and every hit condition fails — padding is masked for free (same
    property the lane padding inside a block relies on)."""
    n = packed.n_leaves
    n_pad = -(-n // CHUNK) * CHUNK
    extra = (n_pad - n) * BLOCK_ROWS
    if extra == 0:
        return packed.coeff_uv, packed.coeff_t, packed.coeff_pay, n_pad
    pad = lambda a: jnp.pad(a, ((0, extra), (0, 0)))
    return (
        pad(packed.coeff_uv),
        pad(packed.coeff_t),
        pad(packed.coeff_pay),
        n_pad,
    )


def _stream_blocks(cuv_ref, ct_ref, cpay_ref, o3, d3, best0_row, n_blocks):
    """Run the zero-sync streaming visit loop over all superleaf blocks.

    ``best0_row``: (1, 1024) initial best_t (e.g. sphere-seeded).  Returns
    (best_t, nx, ny, nz, mat_id) as (1, 1024) rows; mat_id = -1 on miss.
    """
    ox, oy, oz = o3
    dx, dy, dz = d3
    # per-ray Plücker features, feature-major (8, 1024) rows
    row = lambda a: jnp.reshape(a, (1, N_LANES))
    zrow = jnp.zeros((1, N_LANES), jnp.float32)
    mx = oy * dz - oz * dy
    my = oz * dx - ox * dz
    mz = ox * dy - oy * dx
    fuv = jnp.concatenate(
        [row(mx), row(my), row(mz), row(dx), row(dy), row(dz), zrow, zrow],
        axis=0,
    )
    fo1 = jnp.concatenate(
        [row(ox), row(oy), row(oz), zrow, zrow, zrow, zrow + 1.0, zrow],
        axis=0,
    )
    iota_f = jax.lax.broadcasted_iota(
        jnp.int32, (SUPERLEAF, N_LANES), 0
    ).astype(jnp.float32)

    def visit(base, carry):
        best_row, nx_row, ny_row, nz_row, mid_row = carry
        quv = jax.lax.dot_general(
            jnp.transpose(cuv_ref[pl.ds(base, BLOCK_ROWS), :]), fuv,
            _CD, precision=_HI, preferred_element_type=jnp.float32,
        )
        t_num = jax.lax.dot_general(
            jnp.transpose(ct_ref[pl.ds(base, BLOCK_ROWS), :]), fo1,
            _CD, precision=_HI, preferred_element_type=jnp.float32,
        )
        det = quv[0:SUPERLEAF]
        u_num = quv[SUPERLEAF : 2 * SUPERLEAF]
        v_num = quv[2 * SUPERLEAF : 3 * SUPERLEAF]
        idet = 1.0 / det  # det==0 padding -> NaN -> all compares False
        uu = u_num * idet
        vv = v_num * idet
        tt = t_num * idet
        best_b = jnp.broadcast_to(best_row, (SUPERLEAF, N_LANES))
        hit = (
            (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
            & (tt > T_MIN) & (tt < best_b)
            # near-parallel guard: tiny nonzero det gives huge u/v/t from
            # fp32 division — same eps as the traverse_mxu_numpy oracle
            & (jnp.abs(det) > 1e-12)
        )
        tcand = jnp.where(hit, tt, INF)
        tmin = jnp.min(tcand, axis=0, keepdims=True)
        improved = tmin < best_row
        win = tcand == jnp.broadcast_to(tmin, (SUPERLEAF, N_LANES))
        jsel = jnp.min(
            jnp.where(win, iota_f, jnp.float32(1e9)), axis=0, keepdims=True
        )
        onehot = (
            iota_f == jnp.broadcast_to(jsel, (SUPERLEAF, N_LANES))
        ).astype(jnp.float32)
        pay = jax.lax.dot_general(
            cpay_ref[pl.ds(base, BLOCK_ROWS), :], onehot,
            _CD, precision=_HI, preferred_element_type=jnp.float32,
        )
        nx_row = jnp.where(improved, pay[0:1, :], nx_row)
        ny_row = jnp.where(improved, pay[1:2, :], ny_row)
        nz_row = jnp.where(improved, pay[2:3, :], nz_row)
        mid_row = jnp.where(improved, pay[3:4, :], mid_row)
        best_row = jnp.minimum(best_row, tmin)
        return best_row, nx_row, ny_row, nz_row, mid_row

    def body(it, carry):
        for k in range(CHUNK):
            carry = visit((it * CHUNK + k) * BLOCK_ROWS, carry)
        return carry

    zrow = jnp.zeros((1, N_LANES), jnp.float32)
    init = (
        best0_row,
        zrow, zrow, zrow,
        zrow - 1.0,  # material id; -1 = no triangle hit
    )
    return jax.lax.fori_loop(0, n_blocks // CHUNK, body, init)


def make_mxu_stream_intersect(
    cuv_ref, ct_ref, cpay_ref, spheres, mats, *, n_blocks: int
):
    """Build the ``intersect_fn`` plugged into ``trace_tile``.

    ``n_blocks`` must be the padded (CHUNK-multiple) block count of the
    tables behind the refs.  ``spheres``/``mats`` as in
    ``bvh_megakernel.make_packet_intersect``.
    """
    assert n_blocks % CHUNK == 0

    def intersect(o3, d3, active):
        # spheres first: their hits seed best_t (ground/light cull mesh hits)
        st = mk.init_hit_state(d3[0])
        st = mk.sphere_unroll(spheres, o3, d3, st)
        best_row, nxr, nyr, nzr, midr = _stream_blocks(
            cuv_ref, ct_ref, cpay_ref, o3, d3,
            jnp.reshape(st["best_t"], (1, N_LANES)), n_blocks,
        )
        tile = lambda r: jnp.reshape(r, (TILE_H, TILE_W))
        mid = tile(midr)
        tri_hit = mid >= 0.0
        st["best_t"] = tile(best_row)
        st["hit_is_tri"] = tri_hit
        st["tnx"] = tile(nxr)
        st["tny"] = tile(nyr)
        st["tnz"] = tile(nzr)
        for m, fields in enumerate(mats):
            mk._select_mats(st, tri_hit & (mid == np.float32(m)), fields)
        return mk.finish_intersect(o3, d3, st)

    return intersect


def _kernel(
    seed_ref, cam_ref, mat_ref, sph_ref, cuv_ref, ct_ref, cpay_ref,
    out_r, out_g, out_b,
    *, spp, max_depth, width, height, n_spheres, n_mats, n_blocks,
    inclusive_uv, has_lens=False,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    row = i * TILE_H + jax.lax.broadcasted_iota(
        jnp.int32, (TILE_H, TILE_W), 0
    )
    col = j * TILE_W + jax.lax.broadcasted_iota(
        jnp.int32, (TILE_H, TILE_W), 1
    )
    cam = mk.cam_tuple(cam_ref, has_lens)
    spheres = [
        tuple(sph_ref[k, f] for f in range(14)) for k in range(n_spheres)
    ]
    mats = [
        tuple(mat_ref[m, f] for f in range(10)) for m in range(n_mats)
    ]
    intersect = make_mxu_stream_intersect(
        cuv_ref, ct_ref, cpay_ref, spheres, mats, n_blocks=n_blocks
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
    )
    inv = np.float32(1.0 / spp)
    out_r[:] = r * inv
    out_g[:] = g * inv
    out_b[:] = b * inv


@functools.partial(jax.jit, static_argnames=("interpret",))
def _intersect_tile_launch(packed, origins, dirs, interpret):
    cuv, ct, cpay, n_blocks = _pad_blocks(packed)
    n_rows = origins.shape[0] // TILE_W
    comps = [
        origins[:, 0], origins[:, 1], origins[:, 2],
        dirs[:, 0], dirs[:, 1], dirs[:, 2],
    ]
    comps = [c.reshape(n_rows, TILE_W) for c in comps]
    grid = (pl.cdiv(n_rows, TILE_H),)
    kernel = functools.partial(_raw_intersect_kernel, n_blocks=n_blocks)
    block = pl.BlockSpec(
        (TILE_H, TILE_W), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    full = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((n_rows, TILE_W), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(out_shape,) * 5,
        in_specs=[block] * 6 + [full(cuv), full(ct), full(cpay)],
        out_specs=(block,) * 5,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                (cuv.size + ct.size + cpay.size) * 4 + (8 << 20)
            )
        ),
        interpret=interpret,
    )(*comps, cuv, ct, cpay)
    return [o.reshape(-1) for o in outs]


def _raw_intersect_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    cuv_ref, ct_ref, cpay_ref,
    out_t, out_nx, out_ny, out_nz, out_mid,
    *, n_blocks,
):
    """Streaming intersect exposing the raw (t, normal, mat-id) registers."""
    o3 = (ox_ref[:], oy_ref[:], oz_ref[:])
    d3 = (dx_ref[:], dy_ref[:], dz_ref[:])
    best_row, nxr, nyr, nzr, midr = _stream_blocks(
        cuv_ref, ct_ref, cpay_ref, o3, d3,
        jnp.full((1, N_LANES), INF, jnp.float32), n_blocks,
    )
    tile = lambda r: jnp.reshape(r, (TILE_H, TILE_W))
    out_t[:] = tile(best_row)
    out_nx[:] = tile(nxr)
    out_ny[:] = tile(nyr)
    out_nz[:] = tile(nzr)
    out_mid[:] = tile(midr)


def intersect_tile_mxu(packed, origins, dirs, *, interpret=False):
    """Nearest-hit query through the streaming kernel (testing/debug API).

    Same contract as ``bvh_megakernel.intersect_tile``: (N, 3) rays with N a
    multiple of 1024 → (t, normal (N,3), mat_id), t = 1e20 on miss.
    """
    t, nx, ny, nz, mid = _intersect_tile_launch(
        packed, jnp.asarray(origins), jnp.asarray(dirs), interpret
    )
    return t, jnp.stack([nx, ny, nz], axis=-1), mid.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "spp", "max_depth", "n_spheres", "n_mats",
        "inclusive_uv", "interpret",
    ),
)
def _launch(
    seed_arr, scene, camera, *, width, height, spp, max_depth,
    n_spheres, n_mats, inclusive_uv, interpret,
):
    packed = scene.wide
    cuv, ct, cpay, n_blocks = _pad_blocks(packed)

    cam_arr = mk.pack_camera_jnp(camera)
    sph_arr = (
        mk.pack_scene_jnp(scene)
        if n_spheres > 0
        else jnp.zeros((1, 16), jnp.float32)
    )
    from .bvh_megakernel import pack_materials_jnp

    mat_arr = pack_materials_jnp(scene.materials)

    grid_h = pl.cdiv(height, TILE_H)
    grid_w = pl.cdiv(width, TILE_W)
    h_pad = grid_h * TILE_H
    w_pad = grid_w * TILE_W

    kernel = functools.partial(
        _kernel,
        spp=spp, max_depth=max_depth, width=width, height=height,
        n_spheres=n_spheres, n_mats=n_mats, n_blocks=n_blocks,
        inclusive_uv=inclusive_uv, has_lens=camera.has_lens,
    )
    out_shape = jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32)
    block = pl.BlockSpec(
        (TILE_H, TILE_W), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    full = lambda a: pl.BlockSpec(
        a.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )
    params = pltpu.CompilerParams(
        vmem_limit_bytes=int(
            (cuv.size + ct.size + cpay.size) * 4 + (8 << 20)
        ),
    )
    return pl.pallas_call(
        kernel,
        grid=(grid_h, grid_w),
        out_shape=(out_shape, out_shape, out_shape),
        in_specs=[smem, smem, smem, smem, full(cuv), full(ct), full(cpay)],
        out_specs=(block, block, block),
        compiler_params=params,
        interpret=interpret,
    )(seed_arr, cam_arr, mat_arr, sph_arr, cuv, ct, cpay)


def render_flat_mxu_megakernel(
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
):
    """Streaming-MXU mesh render → flat (H*W, 3) bottom-up HDR buffer.

    Requires ``scene.wide`` (see :func:`spira_tpu.accel.mxu.attach_mxu`).
    Same estimator family and PCG RNG stream as the sphere and packet-BVH
    megakernels — identical scenes render statistically identically on all
    three.
    """
    if scene.wide is None or not hasattr(scene.wide, "coeff_uv"):
        # scene.wide may also hold a plain 16-wide WideBVH (attach_wide),
        # which has no superleaf coefficient tables
        raise ValueError(
            "scene has no MXU superleaf tables; call "
            "spira_tpu.accel.mxu.attach_mxu"
        )
    r, g, b = _launch(
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
    )
    return mk._crop_flat(r, g, b, width, height)
