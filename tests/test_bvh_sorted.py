"""Sorted bounce-wavefront engine (render_flat_bvh_sorted): per-bounce ray
regrouping in front of the Pallas packet traversal.

Sorting is a pure work-scheduling choice — a permutation around an
order-independent per-ray query — so sorted and unsorted images must be
BIT-identical, and both must match the wavefront engine (identical threefry
streams; only the traversal implementation differs)."""

import numpy as np
import pytest

from spira_tpu.accel.pairs import attach_packed
from spira_tpu.render import render_flat, render_flat_bvh_sorted
from spira_tpu.scene.camera import make_camera
from spira_tpu.scene.scene import create_mesh_scene


def test_sorted_wavefront_matches_wavefront_and_is_sort_invariant():
    scene = attach_packed(create_mesh_scene(subdivisions=1))
    cam = make_camera(lookfrom=(0.0, 1.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      aspect_ratio=4.0)
    kw = dict(width=128, height=16, spp=2, max_depth=3, seed=5)

    srt = np.asarray(
        render_flat_bvh_sorted(scene, cam, interpret=True, tile_h=8, **kw)
    )
    uns = np.asarray(
        render_flat_bvh_sorted(scene, cam, interpret=True, tile_h=8,
                               sort=False, **kw)
    )
    wf = np.asarray(render_flat(scene, cam, **kw))

    assert np.isfinite(srt).all() and srt.std() > 1e-3
    np.testing.assert_array_equal(srt, uns)  # permutation-invariance
    np.testing.assert_allclose(srt, wf, rtol=1e-3, atol=1e-4)


def test_sorted_wavefront_shards_bitwise():
    """The sorted engine under a 4-device tile mesh matches the wavefront
    engine (the shard body is accumulate_rows with the packet intersect;
    threefry keys fold in row_start, so shards decorrelate identically to
    the plain wavefront sharded path)."""
    from spira_tpu.parallel.mesh import make_mesh
    from spira_tpu.parallel.sharded import render_flat_sharded

    scene = attach_packed(create_mesh_scene(subdivisions=1))
    cam = make_camera(lookfrom=(0.0, 1.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      aspect_ratio=4.0)
    kw = dict(width=128, height=16, spp=2, max_depth=2, seed=5)
    mesh = make_mesh(n_tile=4, n_spp=1)
    srt = np.asarray(
        render_flat_sharded(scene, cam, mesh=mesh,
                            engine="bvh_sorted_interpret", **kw)
    )
    wf = np.asarray(
        render_flat_sharded(scene, cam, mesh=mesh, engine="wavefront", **kw)
    )
    assert np.isfinite(srt).all()
    np.testing.assert_allclose(srt, wf, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_sorted_wavefront_spectral_matches_spectral_wavefront():
    """Spectral transport through the sorted-packet traversal: identical
    threefry streams as the plain spectral wavefront, so images match to
    float tolerance on a packed mesh scene."""
    scene = attach_packed(create_mesh_scene(subdivisions=1))
    cam = make_camera(lookfrom=(0.0, 1.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      aspect_ratio=4.0)
    kw = dict(width=64, height=16, spp=2, max_depth=2, seed=9)
    srt = np.asarray(
        render_flat_bvh_sorted(scene, cam, interpret=True, tile_h=8,
                               spectral=True, **kw)
    )
    wf = np.asarray(render_flat(scene, cam, spectral=True, **kw))
    assert np.isfinite(srt).all() and srt.std() > 1e-3
    np.testing.assert_allclose(srt, wf, rtol=1e-3, atol=1e-4)


def test_engine_dispatch_passes_spectral_to_bvh_sorted():
    """render_flat_engine(engine='bvh_sorted', spectral=True) must render
    spectrally (regression: the dispatch branch silently dropped the
    spectral flag and returned an RGB-transport image)."""
    from spira_tpu.render import render_flat_engine

    scene = attach_packed(create_mesh_scene(subdivisions=1))
    cam = make_camera(lookfrom=(0.0, 1.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      aspect_ratio=4.0)
    kw = dict(width=64, height=16, spp=2, max_depth=2, seed=9)
    via_engine = np.asarray(render_flat_engine(
        scene, cam, engine="bvh_sorted_interpret", spectral=True, **kw))
    direct = np.asarray(render_flat_bvh_sorted(
        scene, cam, interpret=True, spectral=True, **kw))
    np.testing.assert_array_equal(via_engine, direct)
    # and reference semantics is a loud error, not a silent downgrade
    with pytest.raises(ValueError, match="physical"):
        render_flat_engine(scene, cam, engine="bvh_sorted_interpret",
                           semantics="reference", **kw)
