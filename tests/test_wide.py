"""16-wide BVH packing (`accel/wide.py`): structural + traversal equivalence.

The wide collapse must preserve the binary BVH's geometry exactly: the
NumPy wide-traversal oracle is differentially tested against brute-force
ray/triangle intersection over the same mesh."""

import jax.numpy as jnp
import numpy as np
import pytest

from spira_tpu.accel.bvh import build_bvh_for_triangles
from spira_tpu.accel.wide import (
    SLOT,
    WIDTH,
    pack_bvh16,
    traverse_wide_numpy,
)
from spira_tpu.integrator.intersect import intersect_triangles
from spira_tpu.scene.obj import icosphere


def _mesh(subdiv=2):
    tris = icosphere(material=3, subdivisions=subdiv)
    bvh = build_bvh_for_triangles(tris, leaf_size=4, use_native=False)
    return tris, bvh


def test_pack_shapes_and_fill():
    tris, bvh = _mesh()
    wide = pack_bvh16(bvh, tris)
    assert wide.nodes.shape[1] == WIDTH * SLOT
    assert wide.nodes.shape[0] % 8 == 0
    assert wide.n_nodes >= 1
    # the collapse must compress: ~8x fewer nodes than binary internals
    n_internal_bin = int(np.sum(np.asarray(bvh.is_leaf) == 0))
    assert wide.n_nodes <= max(1, n_internal_bin // 4)


def test_slot_encoding_round_trip():
    tris, bvh = _mesh()
    wide = pack_bvh16(bvh, tris)
    nodes = np.asarray(wide.nodes)[: wide.n_nodes]
    for p in range(wide.n_nodes):
        raw = nodes[p, 6]
        ptr = np.floor(raw / 4.0)
        axis = raw - ptr * 4.0
        assert axis in (0.0, 1.0, 2.0)
        for c in range(WIDTH):
            cnt = nodes[p, SLOT * c + 7]
            if cnt == 0.0:  # internal child: ptr must be a valid wide row
                q = ptr if c == 0 else nodes[p, SLOT * c + 6]
                assert 0 <= int(q) < wide.n_nodes
            elif cnt < 0.0:  # empty slot: inverted box
                assert nodes[p, SLOT * c + 0] > nodes[p, SLOT * c + 3]


@pytest.mark.parametrize("subdiv", [1, 2])
def test_wide_traversal_matches_brute_force(subdiv):
    tris, bvh = _mesh(subdiv)
    wide = pack_bvh16(bvh, tris)
    rng = np.random.RandomState(7)
    origins = rng.randn(64, 3).astype(np.float32) * 1.5
    dirs = rng.randn(64, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    brute = intersect_triangles(tris, jnp.asarray(origins), jnp.asarray(dirs))
    hit = np.asarray(brute.hit)
    t_ref = np.asarray(brute.t)
    for k in range(origins.shape[0]):
        t_wide, _, mat = traverse_wide_numpy(wide, origins[k], dirs[k])
        if hit[k]:
            assert np.isclose(t_wide, t_ref[k], rtol=1e-4, atol=1e-5)
            assert mat == 3
        else:
            assert not np.isfinite(t_wide)
