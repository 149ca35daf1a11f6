"""Multi-host layer tests (single-host over the 8-device CPU mesh; the
process-boundary paths are exercised on real pods via the same code)."""

import numpy as np
import pytest

import spira_tpu as st
from spira_tpu.parallel.distributed import (
    gather_image,
    global_mesh,
    host_row_ranges,
    initialize,
    is_primary,
)
from spira_tpu.parallel.mesh import make_mesh
from spira_tpu.parallel.sharded import render_flat_sharded


def test_initialize_single_process_noop():
    initialize()  # must not raise on a single-process run
    assert is_primary()


def test_global_mesh_covers_all_devices():
    mesh = global_mesh()
    assert mesh.shape["tile"] * mesh.shape["spp"] == 8


def test_host_row_ranges_partition_image():
    mesh = make_mesh(n_tile=4, n_spp=2)
    ranges = host_row_ranges(32, mesh)
    # single host: all tiles owned by process 0, contiguous cover
    assert list(ranges.keys()) == [0]
    spans = sorted(ranges[0])
    assert spans[0][0] == 0 and spans[-1][1] == 32
    covered = sum(e - s for s, e in spans)
    assert covered == 32


def test_gather_image_roundtrip():
    scene = st.create_scene()
    cam = st.default_camera(2.0)
    mesh = make_mesh(n_tile=4, n_spp=1)
    flat = render_flat_sharded(
        scene, cam, width=32, height=16, mesh=mesh, spp=2, max_depth=2,
        engine="fused",
    )
    img = gather_image(flat)
    assert img.shape == (32 * 16, 3)
    assert np.isfinite(img).all()


@pytest.mark.slow
def test_sharded_fused_invariant_to_mesh_shape():
    """PCG counters are global → the image does not depend on how it was
    sharded (BASELINE gradient/image parity across 1 chip / N chips)."""
    from spira_tpu.kernels.megakernel import render_flat_fused

    scene = st.create_scene()
    cam = st.default_camera(2.0)
    single = np.asarray(
        render_flat_fused(scene, cam, width=64, height=32, spp=4, max_depth=3,
                          seed=9)
    )
    for n_tile, n_spp in [(2, 1), (4, 2), (8, 1)]:
        mesh = make_mesh(n_tile=n_tile, n_spp=n_spp)
        sh = np.asarray(
            render_flat_sharded(
                scene, cam, width=64, height=32, mesh=mesh, spp=4,
                max_depth=3, seed=9, engine="fused",
            )
        )
        np.testing.assert_allclose(sh, single, atol=2e-6)
