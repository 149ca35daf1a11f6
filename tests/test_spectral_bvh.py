"""Spectral packet-BVH megakernel (kernels/spectral_bvh.py): the spectral
tracer driven by the packet traversal must agree with the brute-force fused
spectral engine exactly (same PCG streams, same formulas) on scenes both
can hold, and statistically with the wavefront spectral estimator on large
meshes the fused engine cannot (the round-2 gap: spectral scenes >32 tris
silently dropped to the wavefront path)."""

import numpy as np
import pytest

from spira_tpu.accel.bvh import build_bvh_for_triangles
from spira_tpu.accel.pairs import attach_packed
from spira_tpu.kernels.spectral_bvh import (
    render_flat_spectral_bvh_megakernel,
)
from spira_tpu.kernels.spectral_fused import render_flat_fused_spectral
from spira_tpu.render import render_flat
from spira_tpu.scene.camera import make_camera
from spira_tpu.scene.geometry import make_spheres
from spira_tpu.scene.materials import make_materials
from spira_tpu.scene.obj import icosphere
from spira_tpu.scene.scene import create_mesh_scene, make_scene


def _small_scene(shape="icosphere"):
    if shape == "tetra":
        # 4 triangles: the fused spectral engine's compile time grows
        # steeply with the triangle unroll on the CPU box, so the exact
        # equivalence test uses the smallest closed mesh
        from spira_tpu.scene.geometry import make_triangles

        verts = [(0.0, 0.9, 0.0), (-0.55, 0.05, 0.35),
                 (0.55, 0.05, 0.35), (0.0, 0.05, -0.6)]
        faces = [(0, 1, 2), (0, 2, 3), (0, 3, 1), (1, 3, 2)]
        mesh = make_triangles(verts, faces, material=0)
    else:
        mesh = icosphere(center=(0.0, 0.3, 0.0), radius=0.6, subdivisions=0,
                         material=0)  # 20 triangles
    materials = make_materials(
        [
            dict(albedo=(0.7, 0.3, 0.3), metallic=0.0, roughness=0.5),
            dict(albedo=(0.5, 0.5, 0.5), metallic=0.0, roughness=0.9),
            dict(albedo=(1.0, 1.0, 1.0), emission=(5.0, 5.0, 5.0)),
            dict(albedo=(1.0, 1.0, 1.0), metallic=0.0, roughness=0.0,
                 ior=1.5, transmission=1.0, cauchy_b=0.01),  # dispersive
        ]
    )
    spheres = make_spheres(
        [
            ((0.0, -100.5, 0.0), 100.0, 1),
            ((0.0, 5.0, 0.0), 1.0, 2),
            ((1.1, 0.0, 0.4), 0.35, 3),
        ]
    )
    bvh = build_bvh_for_triangles(mesh)
    scene = make_scene(spheres=spheres, triangles=mesh, materials=materials,
                       bvh=bvh)
    return attach_packed(scene)


def test_spectral_bvh_smoke_renders():
    """Fast tier: the spectral packet kernel (interpret mode) produces a
    finite, structured image on a packed mesh+sphere scene with a
    dispersive material in view."""
    scene = _small_scene()
    cam = make_camera(lookfrom=(0.0, 1.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      aspect_ratio=128.0 / 8.0)
    img = np.asarray(
        render_flat_spectral_bvh_megakernel(
            scene, cam, width=128, height=8, spp=1, max_depth=2, seed=7,
            interpret=True, tile_h=8,
        )
    )
    assert np.isfinite(img).all()
    assert img.std() > 1e-3


@pytest.mark.slow
def test_spectral_bvh_matches_fused_small_scene():
    """The spectral packet megakernel (interpret mode) renders the SAME
    image as the brute fused spectral engine to float tolerance —
    identical estimator, PCG streams, and hit selection.  Uses a 4-tri
    tetrahedron: the fused engine's CPU compile grows steeply with the
    triangle unroll (the 20-tri icosphere variant was validated once:
    max abs diff within rtol=2e-4 in 33 min on the 4-core box)."""
    scene = _small_scene("tetra")
    cam = make_camera(lookfrom=(0.0, 1.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      aspect_ratio=128.0 / 8.0)
    kw = dict(width=128, height=8, spp=1, max_depth=2, seed=7)
    img_pk = np.asarray(
        render_flat_spectral_bvh_megakernel(
            scene, cam, interpret=True, tile_h=8, **kw
        )
    )
    img_fz = np.asarray(render_flat_fused_spectral(scene, cam, **kw))
    assert np.isfinite(img_pk).all()
    assert img_pk.std() > 1e-3
    np.testing.assert_allclose(img_pk, img_fz, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_spectral_bvh_large_mesh_matches_wavefront_statistically():
    """>1k-triangle scene (the case the fused engine rejects): the spectral
    packet megakernel agrees with the wavefront spectral estimator within
    the wavefront path's own seed-to-seed noise floor."""
    scene = attach_packed(create_mesh_scene(subdivisions=2))  # ~1.6k tris
    cam = make_camera(lookfrom=(0.0, 1.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      aspect_ratio=1.0)
    kw = dict(width=16, height=16, spp=8, max_depth=2)
    pk = np.asarray(
        render_flat_spectral_bvh_megakernel(
            scene, cam, seed=0, interpret=True, tile_h=16, **kw
        )
    )
    wf1 = np.asarray(render_flat(scene, cam, seed=1, spectral=True, **kw))
    wf2 = np.asarray(render_flat(scene, cam, seed=2, spectral=True, **kw))
    noise_floor = np.abs(wf1 - wf2).mean()
    assert np.isfinite(pk).all()
    assert abs(pk.mean() - wf1.mean()) < 0.07
    assert np.abs(pk - wf1).mean() < 1.25 * noise_floor
