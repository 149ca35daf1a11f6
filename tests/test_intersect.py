import jax.numpy as jnp
import numpy as np

from spira_tpu.core import vecmath as vm
from spira_tpu.integrator import intersect as isect
from spira_tpu.scene.geometry import make_spheres, make_triangles


def _rays(origins, dirs):
    o = jnp.asarray(origins, jnp.float32)
    d = vm.normalize(jnp.asarray(dirs, jnp.float32))
    return o, d


def test_sphere_head_on():
    spheres = make_spheres([((0.0, 0.0, -5.0), 1.0, 0)])
    o, d = _rays([[0, 0, 0]], [[0, 0, -1]])
    h = isect.intersect_spheres(spheres, o, d)
    assert bool(h.hit[0])
    np.testing.assert_allclose(float(h.t[0]), 4.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 0, 1], atol=1e-6)
    assert int(h.material[0]) == 0


def test_sphere_miss_and_nearest_of_two():
    spheres = make_spheres(
        [((0.0, 0.0, -10.0), 1.0, 0), ((0.0, 0.0, -4.0), 1.0, 1)]
    )
    o, d = _rays([[0, 0, 0], [0, 5, 0]], [[0, 0, -1], [0, 1, 0]])
    h = isect.intersect_spheres(spheres, o, d)
    assert bool(h.hit[0]) and not bool(h.hit[1])
    np.testing.assert_allclose(float(h.t[0]), 3.0, rtol=1e-5)
    assert int(h.material[0]) == 1


def test_sphere_inside_uses_far_root():
    spheres = make_spheres([((0.0, 0.0, 0.0), 2.0, 0)])
    o, d = _rays([[0, 0, 0]], [[1, 0, 0]])
    h = isect.intersect_spheres(spheres, o, d)
    assert bool(h.hit[0])
    np.testing.assert_allclose(float(h.t[0]), 2.0, rtol=1e-5)


def test_tmin_skips_self_intersection():
    spheres = make_spheres([((0.0, 0.0, 0.0), 1.0, 0)])
    # origin on the surface, pointing away: no hit
    o, d = _rays([[0, 0, 1.0]], [[0, 0, 1]])
    h = isect.intersect_spheres(spheres, o, d)
    assert not bool(h.hit[0])


def test_triangle_hit_uv_interior():
    tris = make_triangles(
        [[0, 0, -2], [2, 0, -2], [0, 2, -2]], [[0, 1, 2]], 3
    )
    o, d = _rays([[0.5, 0.5, 0]], [[0, 0, -1]])
    h = isect.intersect_triangles(tris, o, d)
    assert bool(h.hit[0])
    np.testing.assert_allclose(float(h.t[0]), 2.0, rtol=1e-5)
    assert int(h.material[0]) == 3
    np.testing.assert_allclose(abs(float(h.normal[0, 2])), 1.0, atol=1e-6)


def test_triangle_miss_outside_edge():
    tris = make_triangles(
        [[0, 0, -2], [1, 0, -2], [0, 1, -2]], [[0, 1, 2]], 0
    )
    o, d = _rays([[0.9, 0.9, 0]], [[0, 0, -1]])  # outside u+v<=1
    h = isect.intersect_triangles(tris, o, d)
    assert not bool(h.hit[0])


def test_triangle_parallel_ray_misses():
    tris = make_triangles(
        [[0, 0, -2], [1, 0, -2], [0, 1, -2]], [[0, 1, 2]], 0
    )
    o, d = _rays([[0.2, 0.2, 0]], [[1, 0, 0]])
    h = isect.intersect_triangles(tris, o, d)
    assert not bool(h.hit[0])


def test_merge_hits_takes_nearest():
    spheres = make_spheres([((0.0, 0.0, -5.0), 1.0, 7)])
    tris = make_triangles(
        [[-1, -1, -2], [3, -1, -2], [-1, 3, -2]], [[0, 1, 2]], 2
    )
    o, d = _rays([[0, 0, 0]], [[0, 0, -1]])
    hs = isect.intersect_spheres(spheres, o, d)
    ht = isect.intersect_triangles(tris, o, d)
    m = isect.merge_hits(hs, ht)
    assert bool(m.hit[0])
    np.testing.assert_allclose(float(m.t[0]), 2.0, rtol=1e-5)
    assert int(m.material[0]) == 2


def test_brute_force_matches_random_oracle():
    """Vectorized nearest-hit vs scalar NumPy oracle on random rays/spheres."""
    rs = np.random.default_rng(0)
    centers = rs.normal(size=(12, 3)) * 3
    radii = rs.uniform(0.2, 1.5, size=12)
    spheres = make_spheres([(c, r, i) for i, (c, r) in enumerate(zip(centers, radii))])
    o = rs.normal(size=(64, 3)) * 5
    d = rs.normal(size=(64, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    h = isect.intersect_spheres(spheres, jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32))

    for k in range(64):
        best_t, best_i = 1e20, -1
        for i in range(12):
            oc = o[k] - centers[i]
            half_b = np.dot(oc, d[k])
            c = np.dot(oc, oc) - radii[i] ** 2
            disc = half_b**2 - c
            if disc > 0:
                for root in (-half_b - np.sqrt(disc), -half_b + np.sqrt(disc)):
                    if 1e-3 < root < best_t:
                        best_t, best_i = root, i
                        break
        assert bool(h.hit[k]) == (best_i >= 0)
        if best_i >= 0:
            np.testing.assert_allclose(float(h.t[k]), best_t, rtol=2e-4)
            assert int(h.material[k]) == best_i
