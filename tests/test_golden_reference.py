"""Golden statistical parity vs the independent scalar CPU oracle
(BASELINE.json config 1: the reference CPU renderer's images).

RNG sequences differ by construction (threefry counters vs NumPy Generator),
so comparison is statistical: per-pixel Monte-Carlo means within noise bounds
(SURVEY.md §7: "image comparison must be statistical").
"""

import numpy as np
import pytest

import spira_tpu as st

from .reference_impl import (
    CPUReferenceRenderer,
    default_camera_dict,
    default_scene,
)

W, H = 24, 14
SPP = 96
DEPTH = 4


@pytest.fixture(scope="module")
def oracle_image():
    spheres, materials = default_scene()
    ref = CPUReferenceRenderer(spheres, materials, np.random.default_rng(1234))
    cam = default_camera_dict(W / H)
    return ref.render_hdr(cam, W, H, spp=SPP, max_depth=DEPTH)


@pytest.fixture(scope="module")
def jax_image():
    scene = st.create_scene()
    cam = st.default_camera(W / H)
    return np.asarray(
        st.render_hdr(
            scene, cam, W, H, spp=SPP, max_depth=DEPTH, semantics="reference",
            seed=77,
        )
    )


def test_reference_semantics_statistical_match(oracle_image, jax_image):
    diff = np.abs(jax_image - oracle_image)
    # Mean abs error across all pixels/channels well inside MC noise.
    assert diff.mean() < 0.03, f"mean abs diff {diff.mean():.4f}"
    # No pixel wildly off (allow a few noisy outliers near speculars).
    frac_bad = (diff > 0.25).mean()
    assert frac_bad < 0.02, f"{frac_bad:.3%} of channels off by >0.25"
    # Global brightness agrees tightly.
    np.testing.assert_allclose(
        jax_image.mean(), oracle_image.mean(), rtol=0.02
    )


def test_physical_semantics_differs_but_same_scale(oracle_image):
    """Sanity: the faithful estimator renders the same scene at a comparable
    exposure (it is brighter on diffuse surfaces — no 0.5 darkening)."""
    scene = st.create_scene()
    cam = st.default_camera(W / H)
    img = np.asarray(
        st.render_hdr(scene, cam, W, H, spp=32, max_depth=DEPTH, seed=3)
    )
    assert 0.5 < img.mean() / oracle_image.mean() < 2.5


@pytest.mark.slow
def test_russian_roulette_unbiased():
    """RR must not change the expected image (MSL kernel :246-253 semantics)."""
    import jax

    from spira_tpu.core import rng as srng
    from spira_tpu.integrator.path_trace import trace
    from spira_tpu.scene.camera import generate_rays

    scene = st.create_scene()
    cam = st.default_camera(1.0)
    n_samples = 64

    def render_mean(rr: bool, seed: int):
        base = srng.base_key(seed)
        acc = 0.0
        for s in range(n_samples):
            skey = srng.sample_key(base, s)
            o, d = generate_rays(cam, 16, 16, skey)
            r = trace(
                scene, o, d, skey, max_depth=8, semantics="physical",
                russian_roulette=rr,
            )
            acc = acc + np.asarray(r)
        return acc / n_samples

    with_rr = render_mean(True, 0)
    without_rr = render_mean(False, 1)
    np.testing.assert_allclose(with_rr.mean(), without_rr.mean(), rtol=0.05)
