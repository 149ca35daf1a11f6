"""Streaming MXU megakernel (kernels/mxu_megakernel.py): equivalence tests.

Differential ladder mirroring test_bvh_megakernel.py: the numpy Plücker
oracle vs the streaming kernel (interpret mode), then the full render vs
the packet-BVH megakernel (same PCG stream -> identical images)."""

import numpy as np
import pytest

from spira_tpu.accel.bvh import build_two_level
from spira_tpu.accel.mxu import attach_mxu, pack_bvh_mxu, traverse_mxu_numpy
from spira_tpu.accel.pairs import attach_packed
from spira_tpu.kernels.bvh_megakernel import render_flat_bvh_megakernel
from spira_tpu.kernels.mxu_megakernel import (
    CHUNK,
    intersect_tile_mxu,
    render_flat_mxu_megakernel,
)
from spira_tpu.scene.camera import make_camera
from spira_tpu.scene.obj import icosphere
from spira_tpu.scene.scene import create_mesh_scene


def _random_rays(n, seed=0, spread=2.5):
    rng = np.random.default_rng(seed)
    origins = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return origins, dirs


def test_stream_matches_numpy_oracle():
    """Streaming kernel vs the scalar Plücker oracle — t, normal, material;
    the 5-block table also exercises the CHUNK padding path."""
    m0 = icosphere(center=(-0.6, 0.1, 0.0), radius=0.55, subdivisions=2,
                   material=0)
    m1 = icosphere(center=(0.8, -0.2, 0.3), radius=0.45, subdivisions=1,
                   material=1)
    bvh, tris = build_two_level([m0, m1])
    packed = pack_bvh_mxu(bvh, tris)
    assert packed.n_leaves % CHUNK != 0  # padding path is live
    origins, dirs = _random_rays(1024, seed=3, spread=2.0)

    t, n, mid = intersect_tile_mxu(packed, origins, dirs, interpret=True)
    t = np.asarray(t)
    n = np.asarray(n)
    mid = np.asarray(mid)
    for i in range(0, 1024, 13):
        tt, nn, mm = traverse_mxu_numpy(packed, origins[i], dirs[i])
        ref = tt if np.isfinite(tt) else 1e20
        np.testing.assert_allclose(t[i], ref, rtol=1e-4, atol=1e-5)
        if np.isfinite(tt):
            assert mid[i] == mm
            np.testing.assert_allclose(n[i], nn, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_stream_render_matches_packet_kernel():
    """Full render: streaming engine == packet engine to float tolerance
    (same estimator, same PCG stream, different intersector)."""
    scene = create_mesh_scene(subdivisions=2)
    scene = attach_mxu(attach_packed(scene))
    cam = make_camera(lookfrom=(0.0, 1.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      aspect_ratio=128.0 / 16.0)
    kw = dict(width=128, height=16, spp=2, max_depth=3, seed=0,
              interpret=True)
    a = np.asarray(render_flat_mxu_megakernel(scene, cam, **kw))
    b = np.asarray(render_flat_bvh_megakernel(scene, cam, **kw))
    assert np.isfinite(a).all()
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
