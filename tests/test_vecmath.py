import jax.numpy as jnp
import numpy as np
import pytest

from spira_tpu.core import vecmath as vm


def test_dot_and_length():
    a = jnp.asarray([[1.0, 2.0, 2.0], [0.0, 0.0, 0.0]])
    b = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
    np.testing.assert_allclose(vm.dot(a, b), [1.0, 0.0])
    np.testing.assert_allclose(vm.length(a), [3.0, 0.0])


def test_normalize_unit_and_safe():
    a = jnp.asarray([[3.0, 0.0, 4.0]])
    n = vm.normalize(a)
    np.testing.assert_allclose(np.asarray(vm.length(n)), [1.0], rtol=1e-6)
    # zero vector must not NaN
    z = vm.normalize(jnp.zeros((1, 3)))
    assert np.all(np.isfinite(np.asarray(z)))


def test_reflect_matches_formula():
    d = vm.normalize(jnp.asarray([[1.0, -1.0, 0.0]]))
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    r = vm.reflect(d, n)
    np.testing.assert_allclose(
        np.asarray(r), np.asarray(vm.normalize(jnp.asarray([[1.0, 1.0, 0.0]]))), atol=1e-6
    )


def test_refract_straight_through_eta_1():
    d = vm.normalize(jnp.asarray([[0.3, -0.9, 0.1]]))
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    r, tir = vm.refract(d, n, jnp.ones((1, 1)))
    assert not bool(tir[0])
    np.testing.assert_allclose(np.asarray(r), np.asarray(d), atol=1e-6)


def test_refract_snell_angle():
    # 45 degrees into glass (eta = 1/1.5)
    d = vm.normalize(jnp.asarray([[np.sin(np.pi / 4), -np.cos(np.pi / 4), 0.0]]))
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    r, tir = vm.refract(d, n, jnp.full((1, 1), 1 / 1.5))
    assert not bool(tir[0])
    r = np.asarray(vm.normalize(r))[0]
    sin_t = np.hypot(r[0], r[2])
    np.testing.assert_allclose(sin_t, np.sin(np.pi / 4) / 1.5, rtol=1e-5)


def test_refract_total_internal_reflection():
    # grazing exit from glass: eta = 1.5 > 1, steep angle → TIR
    d = vm.normalize(jnp.asarray([[0.9, -0.435, 0.0]]))
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    _, tir = vm.refract(d, n, jnp.full((1, 1), 1.5))
    assert bool(tir[0])


def test_orthonormal_basis():
    w = vm.normalize(jnp.asarray([[0.2, 0.9, -0.3], [1.0, 0.0, 0.0]]))
    u, v = vm.orthonormal_basis(w)
    for a, b in [(u, v), (u, w), (v, w)]:
        np.testing.assert_allclose(np.asarray(vm.dot(a, b)), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vm.length(u)), 1.0, atol=1e-6)
    # right-handed: u × v = w
    np.testing.assert_allclose(np.asarray(jnp.cross(u, v)), np.asarray(w), atol=1e-6)
