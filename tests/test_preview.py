"""Single-bounce preview renderers (reference §2.5 quick-look family)."""

import numpy as np
import pytest

import jax.numpy as jnp

import spira_tpu as st
from spira_tpu.integrator.preview import _AMBIENT, _LIGHT, render_flat_preview
from spira_tpu.scene.geometry import make_spheres
from spira_tpu.scene.materials import make_materials
from spira_tpu.scene.scene import create_mesh_scene, make_scene


def test_preview_direct_lighting_formula():
    """Head-on ray at a unit sphere: shade must be albedo*max(0.2, n.l)
    with n the face-forwarded normal at the front pole."""
    albedo = (0.6, 0.3, 0.2)
    scene = make_scene(
        spheres=make_spheres([((0.0, 0.0, -2.0), 1.0, 0)]),
        materials=make_materials([dict(albedo=albedo)]),
    )
    cam = st.make_camera(lookfrom=(0.0, 0.0, 1.0), lookat=(0.0, 0.0, -2.0),
                         vfov=40.0, aspect_ratio=1.0)
    flat = np.asarray(
        render_flat_preview(scene, cam, width=64, height=64, seed=0)
    )
    # center pixel: n ~ (0,0,1) up to the half-pixel jitter tilt, so
    # lam ~ l_z within ~10%; the channel RATIOS are exactly the albedo
    # ratios (shade = albedo * lam)
    center = flat.reshape(64, 64, 3)[32, 32]
    lam = max(_AMBIENT, _LIGHT[2])
    np.testing.assert_allclose(center, np.asarray(albedo) * lam, rtol=1e-1)
    np.testing.assert_allclose(
        center / center[0], np.asarray(albedo) / albedo[0], rtol=1e-6
    )
    # corner pixels miss -> sky gradient (blue channel largest)
    corner = flat.reshape(64, 64, 3)[63, 0]
    assert corner[2] >= corner[0]


@pytest.mark.slow
def test_preview_and_normal_modes_through_render_api():
    scene = create_mesh_scene(subdivisions=1)
    cam = st.make_camera(lookfrom=(0.0, 1.0, 3.0), lookat=(0.0, 0.0, 0.0),
                         vfov=50.0, aspect_ratio=2.0)
    for mode in ("preview", "normal"):
        img = st.render(scene, cam, 64, 32, shading=mode)
        assert img.shape == (32, 64, 3)
        assert img.std() > 1.0  # non-trivial image
    # deterministic: same seed twice -> identical
    a = st.render(scene, cam, 64, 32, shading="preview", seed=3)
    b = st.render(scene, cam, 64, 32, shading="preview", seed=3)
    np.testing.assert_array_equal(a, b)
