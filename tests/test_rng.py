import jax.numpy as jnp
import numpy as np

from spira_tpu.core import rng as srng
from spira_tpu.core import vecmath as vm


def test_deterministic_replay():
    """Counter-based draws are pure functions of (seed, sample, bounce,
    stream) — the property path-replay gradients depend on."""
    k = srng.base_key(42)
    s = srng.sample_key(k, 3)
    a = srng.uniform(srng.bounce_key(s, 2, srng.Stream.DIFFUSE_DIR), (16,))
    b = srng.uniform(srng.bounce_key(s, 2, srng.Stream.DIFFUSE_DIR), (16,))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_streams_decorrelated():
    k = srng.sample_key(srng.base_key(0), 0)
    a = srng.uniform(srng.bounce_key(k, 0, srng.Stream.DIFFUSE_DIR), (4096,))
    b = srng.uniform(srng.bounce_key(k, 0, srng.Stream.METAL_FUZZ), (4096,))
    corr = np.corrcoef(np.asarray(a), np.asarray(b))[0, 1]
    assert abs(corr) < 0.06


def test_unit_vector_on_sphere_and_uniform():
    k = srng.base_key(7)
    v = srng.unit_vector(k, (20000,))
    lengths = np.asarray(vm.length(v))
    np.testing.assert_allclose(lengths, 1.0, atol=1e-5)
    # each component mean ~ 0 for a uniform sphere
    means = np.asarray(v).mean(axis=0)
    np.testing.assert_allclose(means, 0.0, atol=0.02)


def test_cosine_hemisphere_distribution():
    """Directions lie in the hemisphere of n and E[cosθ] = 2/3."""
    k = srng.base_key(11)
    n = jnp.broadcast_to(
        vm.normalize(jnp.asarray([0.3, 0.8, -0.5])), (20000, 3)
    )
    d = srng.cosine_hemisphere(k, n)
    cos = np.asarray(vm.dot(d, n))
    assert (cos >= -1e-6).all()
    np.testing.assert_allclose(cos.mean(), 2.0 / 3.0, atol=0.01)
    lengths = np.asarray(vm.length(d))
    np.testing.assert_allclose(lengths, 1.0, atol=1e-5)


def test_uniform_box3_range():
    k = srng.base_key(5)
    b = np.asarray(srng.uniform_box3(k, (1000,)))
    assert b.shape == (1000, 3)
    assert (b >= 0).all() and (b < 1).all()
    np.testing.assert_allclose(b.mean(), 0.5, atol=0.02)
