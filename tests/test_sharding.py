"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

import spira_tpu as st
from spira_tpu.parallel.mesh import make_mesh, replicate, tile_sharding
from spira_tpu.parallel.sharded import render_flat_sharded
from spira_tpu.render import render_flat

W, H = 32, 16


@pytest.fixture(scope="module")
def scene_cam():
    return st.create_scene(), st.default_camera(W / H)


def test_mesh_shapes():
    mesh = make_mesh(n_tile=4, n_spp=2)
    assert mesh.shape == {"tile": 4, "spp": 2}
    mesh1 = make_mesh()
    assert mesh1.shape["tile"] == len(jax.devices())


def test_sharded_render_runs_and_is_sane(scene_cam):
    scene, cam = scene_cam
    mesh = make_mesh(n_tile=4, n_spp=2)
    flat = render_flat_sharded(
        scene, cam, width=W, height=H, mesh=mesh, spp=8, max_depth=3, seed=0
    )
    assert flat.shape == (W * H, 3)
    a = np.asarray(flat)
    assert np.isfinite(a).all()
    # output really is laid out tile-sharded
    assert len(flat.sharding.device_set) == 8


def test_sharded_statistically_matches_single_device(scene_cam):
    """Tile/spp sharding changes RNG streams, not the estimator: means must
    agree within MC noise."""
    scene, cam = scene_cam
    mesh = make_mesh(n_tile=4, n_spp=2)
    spp = 48
    sharded = np.asarray(
        render_flat_sharded(
            scene, cam, width=W, height=H, mesh=mesh, spp=spp, max_depth=4,
            seed=1,
        )
    )
    single = np.asarray(
        render_flat(scene, cam, width=W, height=H, spp=spp, max_depth=4, seed=2)
    )
    assert abs(sharded.mean() - single.mean()) < 0.02
    assert np.abs(sharded - single).mean() < 0.08


def test_tile_shards_differ_because_of_rng_decorrelation(scene_cam):
    """Different tiles of the ground plane must not repeat identical noise
    (the row_start fold in accumulate_rows)."""
    scene, cam = scene_cam
    mesh = make_mesh(n_tile=4, n_spp=1)
    flat = np.asarray(
        render_flat_sharded(
            scene, cam, width=W, height=H, mesh=mesh, spp=1, max_depth=2, seed=0
        )
    ).reshape(H, W, 3)
    # Rows 0-3 (tile 0) vs rows 4-7 (tile 1) both see mostly ground; the
    # *noise* must differ even where content is similar.
    assert np.abs(flat[0] - flat[4]).max() > 1e-4


def test_replicate_places_on_all_devices(scene_cam):
    scene, _ = scene_cam
    mesh = make_mesh(n_tile=8, n_spp=1)
    rep = replicate(scene, mesh)
    assert len(rep.materials.albedo.sharding.device_set) == 8


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    jax.jit(fn).lower(*args)  # trace/lower only; full compile is the
    # driver's job and takes ~30 s at 640x360


@pytest.mark.slow
def test_packet_bvh_sharded_matches_single_device_bitwise():
    """Multi-chip MESH rendering on the packet-BVH engine (bvh_rows shard
    body): tile-sharding a packed mesh scene over 4 devices reproduces the
    single-device packet render BIT-identically (PCG counters key on
    absolute pixel ids; spp axis of 1 adds no reduction)."""
    from spira_tpu.accel.pairs import attach_packed
    from spira_tpu.kernels.bvh_megakernel import render_flat_bvh_megakernel
    from spira_tpu.parallel.sharded import render_flat_sharded
    from spira_tpu.scene.camera import make_camera
    from spira_tpu.scene.scene import create_mesh_scene

    scene = attach_packed(create_mesh_scene(subdivisions=1))
    cam = make_camera(lookfrom=(0.0, 1.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      aspect_ratio=128.0 / 32.0)
    kw = dict(width=128, height=32, spp=2, max_depth=2, seed=5)

    single = np.asarray(
        render_flat_bvh_megakernel(scene, cam, interpret=True, tile_h=8,
                                   **kw)
    )
    mesh = make_mesh(n_tile=4, n_spp=1)
    sharded = np.asarray(
        render_flat_sharded(
            scene, cam, mesh=mesh, engine="pallas_bvh_interpret", **kw
        )
    )
    np.testing.assert_array_equal(single, sharded)


@pytest.mark.slow
def test_mxu_leaf_sharded_matches_single_device_bitwise():
    """The MXU-superleaf packet engine under the tile-sharded renderer
    (engine='pallas_bvh_mxu_interpret'): bit-identical to its own
    single-device render."""
    from spira_tpu.accel.mxu import attach_superleaf
    from spira_tpu.accel.pairs import attach_packed
    from spira_tpu.kernels.bvh_megakernel import render_flat_bvh_megakernel
    from spira_tpu.parallel.sharded import render_flat_sharded
    from spira_tpu.scene.camera import make_camera
    from spira_tpu.scene.scene import create_mesh_scene

    scene = attach_superleaf(attach_packed(create_mesh_scene(subdivisions=1)))
    cam = make_camera(lookfrom=(0.0, 1.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      aspect_ratio=128.0 / 32.0)
    kw = dict(width=128, height=32, spp=2, max_depth=2, seed=5)

    single = np.asarray(
        render_flat_bvh_megakernel(scene, cam, interpret=True, tile_h=8,
                                   mxu_leaf=True, **kw)
    )
    mesh = make_mesh(n_tile=4, n_spp=1)
    sharded = np.asarray(
        render_flat_sharded(
            scene, cam, mesh=mesh, engine="pallas_bvh_mxu_interpret", **kw
        )
    )
    np.testing.assert_array_equal(single, sharded)


def test_adaptive_sharded_matches_single_device_statistically(scene_cam):
    """render_adaptive over a (tile, spp) mesh: the row-set dispatch
    shards rows over tile and samples over spp; the result agrees with
    the single-device uniform render within MC noise and the savings
    behavior survives sharding."""
    from spira_tpu.io.image import assemble_image
    from spira_tpu.pipeline import render_adaptive
    from spira_tpu.utils.config import RenderConfig

    scene, cam = scene_cam
    mesh = make_mesh(n_tile=4, n_spp=2)
    cfg = RenderConfig(width=W, height=H, spp=16, max_depth=3,
                       progress=False)
    img, stats = render_adaptive(
        scene, cam, cfg, tol=0.08, min_spp=4, chunk=4, mesh=mesh,
        return_stats=True,
    )
    assert img.shape == (H, W, 3)
    assert np.isfinite(img).all()
    assert stats["spp_per_row"].min() >= 4
    un = np.asarray(assemble_image(
        render_flat(scene, cam, width=W, height=H, spp=16, max_depth=3),
        W, H))
    assert np.sqrt(np.mean((img - un) ** 2)) < 0.25
    # determinism under the same mesh
    img2 = render_adaptive(scene, cam, cfg, tol=0.08, min_spp=4, chunk=4,
                           mesh=mesh)
    np.testing.assert_array_equal(img, img2)
