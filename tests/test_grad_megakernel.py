"""Fused fwd+bwd Pallas kernel vs jax.grad of the fused-XLA engine.

Both paths trace the identical PCG sample stream, so the loss and every
parameter gradient must agree to float tolerance — this is the strongest
possible check on the in-kernel per-sample VJP replay.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spira_tpu.core.types import replace
from spira_tpu.kernels.grad_megakernel import render_mse_loss_and_grads
from spira_tpu.kernels.megakernel import render_flat_fused
from spira_tpu.scene.camera import make_camera
from spira_tpu.scene.scene import create_scene

W, H, SPP, DEPTH, SEED = 128, 8, 2, 3, 11


def _setup():
    scene = create_scene()
    cam = make_camera(
        lookfrom=(0.0, 1.0, 3.0), lookat=(0.0, 0.0, 0.0), aspect_ratio=W / H
    )
    # target: a slightly perturbed render so residuals are non-trivial
    target = render_flat_fused(
        scene, cam, width=W, height=H, spp=SPP, max_depth=DEPTH, seed=99
    )
    return scene, cam, jnp.asarray(target) * 0.9


def _fused_loss(scene, cam, target):
    img = render_flat_fused(
        scene, cam, width=W, height=H, spp=SPP, max_depth=DEPTH, seed=SEED
    )
    return jnp.mean((img - target) ** 2)


@pytest.mark.slow
def test_pallas_grad_kernel_matches_fused_autodiff():
    scene, cam, target = _setup()

    loss_pk, d_scene, d_cam = render_mse_loss_and_grads(
        scene, cam, target, width=W, height=H, spp=SPP, max_depth=DEPTH,
        seed=SEED, interpret=True,
    )

    def loss_of(albedo, emission, origin):
        mats = replace(scene.materials, albedo=albedo, emission=emission)
        sc = replace(scene, materials=mats)
        cm = replace(cam, origin=origin)
        return _fused_loss(sc, cm, target)

    loss_ref, (g_alb, g_em, g_org) = jax.value_and_grad(
        loss_of, argnums=(0, 1, 2)
    )(scene.materials.albedo, scene.materials.emission, cam.origin)

    np.testing.assert_allclose(float(loss_pk), float(loss_ref), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(d_scene.materials.albedo), np.asarray(g_alb),
        rtol=2e-3, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(d_scene.materials.emission), np.asarray(g_em),
        rtol=2e-3, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(d_cam.origin), np.asarray(g_org), rtol=2e-3, atol=1e-4
    )
    # geometry gradients exist and are finite (sphere centers/radii)
    assert np.isfinite(np.asarray(d_scene.spheres.centers)).all()
    assert np.abs(np.asarray(d_scene.spheres.centers)).max() > 0


@pytest.mark.slow
def test_grad_spp_subsample_is_consistent():
    """grad_spp=1 replays only sample 0 scaled by spp — an unbiased
    stochastic estimator whose value must equal the sample-0 term of the
    full gradient sum (loss itself is unchanged)."""
    scene, cam, target = _setup()
    loss_full, d_full, _ = render_mse_loss_and_grads(
        scene, cam, target, width=W, height=H, spp=SPP, max_depth=DEPTH,
        seed=SEED, interpret=True,
    )
    loss_sub, d_sub, _ = render_mse_loss_and_grads(
        scene, cam, target, width=W, height=H, spp=SPP, grad_spp=1,
        max_depth=DEPTH, seed=SEED, interpret=True,
    )
    np.testing.assert_allclose(float(loss_sub), float(loss_full), rtol=1e-6)
    g_full = np.asarray(d_full.materials.albedo)
    g_sub = np.asarray(d_sub.materials.albedo)
    assert np.isfinite(g_sub).all()
    # same order of magnitude and correlated sign with the full gradient
    assert np.abs(g_sub).max() > 0
    num = float((g_full * g_sub).sum())
    den = float(
        np.sqrt((g_full ** 2).sum()) * np.sqrt((g_sub ** 2).sum())
    )
    assert num / max(den, 1e-12) > 0.5


# ---------------------------------------------------------------------------
# Hybrid differentiable render (Pallas fwd / fused-XLA bwd via custom_vjp)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_hybrid_grad_matches_fused_at_full_replay():
    from spira_tpu.kernels.megakernel import render_flat_hybrid_grad

    scene, cam, target = _setup()

    def loss_h(materials):
        img = render_flat_hybrid_grad(
            replace(scene, materials=materials), cam, width=W, height=H,
            spp=SPP, max_depth=DEPTH, seed=SEED,
        )
        return jnp.mean((img - target) ** 2)

    lh, gh = jax.value_and_grad(loss_h)(scene.materials)
    lf, gf = jax.value_and_grad(
        lambda m: _fused_loss(replace(scene, materials=m), cam, target)
    )(scene.materials)
    # grad_spp defaults to spp: the backward replays the identical fused
    # estimator, so loss AND gradients match to float tolerance
    assert np.isclose(float(lh), float(lf), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(gh.albedo), np.asarray(gf.albedo), rtol=1e-5, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(gh.emission), np.asarray(gf.emission), rtol=1e-5,
        atol=1e-8,
    )


@pytest.mark.slow
def test_hybrid_grad_subsampled_unbiased_direction():
    from spira_tpu.kernels.megakernel import render_flat_hybrid_grad

    scene, cam, target = _setup()

    def loss_h(materials, grad_spp):
        img = render_flat_hybrid_grad(
            replace(scene, materials=materials), cam, width=W, height=H,
            spp=SPP, max_depth=DEPTH, seed=SEED, grad_spp=grad_spp,
        )
        return jnp.mean((img - target) ** 2)

    # loss is the exact full-spp value regardless of grad_spp
    l_sub, g_sub = jax.value_and_grad(lambda m: loss_h(m, 1))(
        scene.materials
    )
    l_full, g_full = jax.value_and_grad(lambda m: loss_h(m, SPP))(
        scene.materials
    )
    assert np.isclose(float(l_sub), float(l_full), rtol=1e-6)
    # the 1-sample stochastic gradient still points the same way
    a = np.asarray(g_sub.albedo).ravel()
    b = np.asarray(g_full.albedo).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.7, f"subsampled gradient diverged: cos={cos:.3f}"
