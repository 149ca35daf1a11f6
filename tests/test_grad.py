"""Gradient correctness: finite-difference parity and the Adam inverse loop
(BASELINE.json: "gradient parity vs finite differences"; config 4)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

import spira_tpu as st
from spira_tpu.diff.inverse import make_inverse_step, mse_loss, render_for_grad

W, H, SPP, DEPTH = 24, 12, 2, 4


def _loss(albedo, emission, scene, cam, target):
    img = render_for_grad(
        {"albedo": albedo, "emission": emission},
        scene,
        cam,
        width=W,
        height=H,
        spp=SPP,
        max_depth=DEPTH,
        seed=5,
    )
    return mse_loss(img, target)


def test_grad_matches_finite_differences():
    """The renderer is deterministic given the seed, so central differences
    give the exact directional derivative of the same estimator (max_depth=4
    keeps Russian roulette inactive → loss is smooth in albedo/emission)."""
    scene = st.create_scene()
    cam = st.default_camera(W / H)
    target = jnp.zeros((W * H, 3), jnp.float32) + 0.25

    albedo = scene.materials.albedo
    emission = scene.materials.emission
    loss_fn = jax.jit(lambda a, e: _loss(a, e, scene, cam, target))
    ga, ge = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))(albedo, emission)

    rs = np.random.default_rng(0)
    checks = 0
    for arr, grad, name in [(albedo, ga, "albedo"), (emission, ge, "emission")]:
        arr = np.asarray(arr, np.float64)
        for _ in range(4):
            i = rs.integers(arr.shape[0])
            j = rs.integers(3)
            eps = 2e-3
            ap = arr.copy()
            ap[i, j] += eps
            am = arr.copy()
            am[i, j] -= eps
            if name == "albedo":
                fp = float(loss_fn(jnp.asarray(ap, jnp.float32), emission))
                fm = float(loss_fn(jnp.asarray(am, jnp.float32), emission))
            else:
                fp = float(loss_fn(albedo, jnp.asarray(ap, jnp.float32)))
                fm = float(loss_fn(albedo, jnp.asarray(am, jnp.float32)))
            fd = (fp - fm) / (2 * eps)
            an = float(grad[i, j])
            # absolute tolerance for near-zero grads, relative otherwise
            assert abs(fd - an) <= max(2e-3, 0.06 * abs(fd)), (
                f"{name}[{i},{j}]: fd={fd:.6f} grad={an:.6f}"
            )
            checks += 1
    assert checks == 8


def test_nonzero_gradients_flow_to_visible_materials():
    scene = st.create_scene()
    cam = st.default_camera(W / H)
    target = jnp.zeros((W * H, 3), jnp.float32)
    g = jax.grad(
        lambda a: _loss(a, scene.materials.emission, scene, cam, target)
    )(scene.materials.albedo)
    g = np.asarray(g)
    # ground (mat 1) and center sphere (mat 0) dominate the view
    assert np.abs(g[1]).max() > 0
    assert np.abs(g[0]).max() > 0


def test_inverse_rendering_recovers_albedo():
    """Adam loop recovers a perturbed albedo (tiny config of BASELINE
    config 4)."""
    scene = st.create_scene()
    cam = st.default_camera(W / H)
    true_albedo = scene.materials.albedo

    from spira_tpu.render import render_flat

    target = render_flat(
        scene, cam, width=W, height=H, spp=8, max_depth=DEPTH, seed=99
    )

    step, init = make_inverse_step(
        width=W, height=H, spp=SPP, max_depth=DEPTH, learning_rate=5e-2
    )
    # perturb the red sphere + ground albedo
    albedo0 = true_albedo.at[0].set(jnp.asarray([0.2, 0.7, 0.7]))
    albedo0 = albedo0.at[1].set(jnp.asarray([0.9, 0.2, 0.9]))
    params = {"albedo": albedo0}
    opt_state = init(params)

    losses = []
    for it in range(60):
        params, opt_state, loss = step(
            params, opt_state, scene, cam, target, it
        )
        losses.append(float(loss))

    err0 = float(jnp.abs(albedo0[:2] - true_albedo[:2]).mean())
    err1 = float(jnp.abs(params["albedo"][:2] - true_albedo[:2]).mean())
    assert err1 < 0.5 * err0, f"albedo error {err0:.3f} -> {err1:.3f}"
    assert np.mean(losses[-10:]) < 0.5 * np.mean(losses[:5])


@pytest.mark.slow
def test_camera_gradients_flow_fused():
    """BASELINE: pixel gradients w.r.t. camera — the fused engine traces the
    camera frame, so d(loss)/d(origin, fov-derived vectors) exists."""
    from spira_tpu.core.types import replace as dc_replace
    from spira_tpu.kernels.megakernel import render_flat_fused

    scene = st.create_scene()
    cam = st.default_camera(2.0)
    target = jnp.full((16 * 128, 3), 0.3, jnp.float32)

    def loss(origin):
        c = dc_replace(cam, origin=origin)
        img = render_flat_fused(scene, c, width=128, height=16, spp=2,
                                max_depth=3, seed=0)
        return jnp.mean((img - target) ** 2)

    g = np.asarray(jax.grad(loss)(cam.origin))
    assert np.isfinite(g).all() and np.abs(g).max() > 0
    # FD check on the z coordinate (dominant for a dolly move)
    eps = 1e-2
    up = np.asarray(cam.origin).copy(); up[2] += eps
    dn = np.asarray(cam.origin).copy(); dn[2] -= eps
    fd = (float(loss(jnp.asarray(up))) - float(loss(jnp.asarray(dn)))) / (2 * eps)
    assert abs(fd - g[2]) <= max(5e-3, 0.15 * abs(fd)), (fd, g[2])


@pytest.mark.slow
def test_geometry_gradients_flow_fused():
    """Gradients w.r.t. sphere centers/radii (interior illumination terms;
    silhouette discontinuities excluded by construction of the check)."""
    from spira_tpu.core.types import replace as dc_replace
    from spira_tpu.kernels.megakernel import render_flat_fused

    scene = st.create_scene()
    cam = st.default_camera(2.0)
    target = jnp.zeros((16 * 128, 3), jnp.float32)

    def loss(centers):
        sp = dc_replace(scene.spheres, centers=centers)
        sc = dc_replace(scene, spheres=sp)
        img = render_flat_fused(sc, cam, width=128, height=16, spp=2,
                                max_depth=3, seed=0)
        return jnp.mean((img - target) ** 2)

    g = np.asarray(jax.grad(loss)(scene.spheres.centers))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0


def test_inverse_rendering_recovers_emission():
    """BASELINE config 4 also names light emission: recover the light's
    intensity from a target render."""
    scene = st.create_scene()
    cam = st.make_camera(
        lookfrom=(0.0, 1.0, 3.0), lookat=(0.0, 3.0, 0.0), vfov=60.0,
        aspect_ratio=2.0,
    )  # light sphere in view
    from spira_tpu.render import render_flat

    target = render_flat(scene, cam, width=32, height=16, spp=8, max_depth=3,
                         seed=7)
    step, init = make_inverse_step(
        width=32, height=16, spp=2, max_depth=3, learning_rate=0.15
    )
    true_emission = scene.materials.emission
    params = {"emission": jnp.zeros_like(true_emission) + 0.5}
    opt_state = init(params)
    for it in range(200):
        params, opt_state, loss = step(params, opt_state, scene, cam, target, it)
    rec = float(params["emission"][4].mean())  # light material
    assert abs(rec - 5.0) < 1.0, f"recovered emission {rec:.2f} (true 5.0)"


@pytest.mark.slow
def test_inverse_spectral_recovers_albedo_spd():
    """Spectral inverse rendering: recover a perturbed albedo SPD through
    the hero-wavelength estimator (config 4, spectral)."""
    scene = st.create_scene()
    # frame the red diffuse sphere so its material dominates the signal
    cam = st.make_camera(
        lookfrom=(0, 0.3, 1.5), lookat=(0, 0, 0), vfov=45, aspect_ratio=2.0
    )
    from spira_tpu.render import render_flat

    target = render_flat(scene, cam, width=32, height=16, spp=8, max_depth=3,
                         seed=3, spectral=True)
    step, init = make_inverse_step(
        width=32, height=16, spp=4, max_depth=3, learning_rate=0.04,
        spectral=True,
    )
    true_spd = scene.materials.albedo_spd
    spd0 = jnp.full_like(true_spd, 0.5)
    params = {"albedo_spd": spd0}
    opt_state = init(params)
    for it in range(150):
        params, opt_state, loss = step(params, opt_state, scene, cam, target, it)
    # An RGB-image loss determines an SPD only up to metamers: assert the
    # *colorimetric* recovery — the XYZ projection of the recovered sphere
    # SPD converges to the truth (pointwise SPD identity would need
    # spectral targets or smoothness priors).
    import numpy as _np

    from spira_tpu.core import colorimetry as cl

    lam = jnp.asarray(_np.linspace(cl.LAMBDA_MIN, cl.LAMBDA_MAX, 256))

    def spd_xyz(spd):
        vals = jax.vmap(lambda t: cl.sample_spd(t, lam))(spd)  # (M, 256)
        return cl.spectrum_to_xyz(vals, jnp.broadcast_to(lam, vals.shape))

    xyz_true = _np.asarray(spd_xyz(true_spd))
    xyz0 = _np.asarray(spd_xyz(spd0))
    xyz1 = _np.asarray(spd_xyz(params["albedo_spd"]))
    err0 = _np.abs(xyz0[0] - xyz_true[0]).mean()
    err1 = _np.abs(xyz1[0] - xyz_true[0]).mean()
    assert err1 < 0.5 * err0, f"XYZ error {err0:.3f} -> {err1:.3f}"


def test_camera_grad_traces_through_bvh_mesh_fast():
    """Fast-tier canary for the round-2 bug: jax.grad w.r.t. camera.origin
    on a BVH mesh scene used to RAISE at TRACE time (lax.while_loop is not
    reverse-differentiable).  eval_shape exercises the trace without the
    multi-minute CPU compile; FD parity runs in the slow tier below."""
    from spira_tpu.core.types import replace as dc_replace
    from spira_tpu.render import render_flat
    from spira_tpu.scene.camera import make_camera

    scene = st.create_mesh_scene(subdivisions=2)
    cam = make_camera(lookfrom=(0.0, 1.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      aspect_ratio=4.0)

    def loss(origin):
        c = dc_replace(cam, origin=origin)
        img = render_flat(scene, c, width=64, height=16, spp=2,
                          max_depth=2, seed=3)
        return jnp.mean(img ** 2)

    out = jax.eval_shape(jax.grad(loss), cam.origin)
    assert out.shape == (3,)


def test_fd_parity_through_bvh_traversal_fast():
    """FD gradient parity through the BVH traversal in the DEFAULT tier
    (VERDICT r3 item 3): camera-origin + mesh-albedo gradients on a real
    BVH mesh scene, checked against central differences on every plain
    ``pytest -q`` run, not only in the slow tier.

    Budget trick: the wavefront mesh backward's compile cost scales with
    (traversal chunk x leaf unroll); rebuilding the subdiv-0 icosphere's
    tree at leaf<=4 (vs create_mesh_scene's 16) cuts the compile ~15x
    (~13 s on an idle multicore box), and ONE jitted value_and_grad serves
    both the analytic gradients and every FD probe (its value output is
    the probe; the wasted grad work is trivial at this shape)."""
    from spira_tpu.accel.bvh import build_bvh
    from spira_tpu.core.types import replace as dc_replace
    from spira_tpu.render import render_flat
    from spira_tpu.scene.camera import make_camera
    from spira_tpu.scene.geometry import triangle_bounds

    scene = st.create_mesh_scene(subdivisions=0)
    lo, hi = triangle_bounds(scene.triangles)
    scene = dc_replace(
        scene, bvh=build_bvh(np.asarray(lo), np.asarray(hi), leaf_size=4)
    )
    cam = make_camera(lookfrom=(0.0, 1.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      aspect_ratio=6.0)

    def loss(origin, albedo):
        c = dc_replace(cam, origin=origin)
        sc = dc_replace(
            scene, materials=dc_replace(scene.materials, albedo=albedo)
        )
        img = render_flat(sc, c, width=48, height=8, spp=1,
                          max_depth=2, seed=3)
        return jnp.mean(img ** 2)

    vag = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    a0 = scene.materials.albedo
    _, (g_cam, g_alb) = vag(cam.origin, a0)
    g_cam = np.asarray(g_cam)
    g_alb = np.asarray(g_alb)
    assert np.isfinite(g_cam).all() and np.isfinite(g_alb).all()
    assert np.abs(g_cam).max() > 0 and np.abs(g_alb).max() > 0

    # camera: eps small enough that no sample crosses a silhouette inside
    # [x-eps, x+eps] (see the slow-tier test's eps study)
    k = int(np.abs(g_cam).argmax())
    eps = 1e-4
    up = np.asarray(cam.origin).copy(); up[k] += eps
    dn = np.asarray(cam.origin).copy(); dn[k] -= eps
    fd = (float(vag(jnp.asarray(up), a0)[0])
          - float(vag(jnp.asarray(dn), a0)[0])) / (2 * eps)
    assert abs(fd - g_cam[k]) <= max(5e-4, 0.05 * abs(fd)), (fd, g_cam[k])

    # albedo: continuous parameter, tight parity on the dominant entry
    a64 = np.asarray(a0, np.float64)
    i, j = np.unravel_index(np.abs(g_alb).argmax(), g_alb.shape)
    eps = 2e-3
    ap = a64.copy(); ap[i, j] += eps
    am = a64.copy(); am[i, j] -= eps
    fd = (float(vag(cam.origin, jnp.asarray(ap, jnp.float32))[0])
          - float(vag(cam.origin, jnp.asarray(am, jnp.float32))[0])) / (2 * eps)
    assert abs(fd - g_alb[i, j]) <= max(2e-3, 0.03 * abs(fd)), (fd, g_alb[i, j])


@pytest.mark.slow
def test_camera_gradients_flow_through_bvh_mesh():
    """VERDICT r2 gap: d(loss)/d(camera.origin) used to RAISE on BVH mesh
    scenes (lax.while_loop traversal is not reverse-differentiable).  The
    traversal now runs on gradient-stopped inputs and the winning hit is
    differentiably recomputed, so camera gradients flow and match FD.
    (Slow tier: the wavefront mesh backward compile alone is ~4 min on
    the 4-core CPU box.)"""
    from spira_tpu.core.types import replace as dc_replace
    from spira_tpu.render import render_flat
    from spira_tpu.scene.camera import make_camera

    scene = st.create_mesh_scene(subdivisions=2)
    cam = make_camera(lookfrom=(0.0, 1.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      aspect_ratio=4.0)

    def loss(origin):
        c = dc_replace(cam, origin=origin)
        img = render_flat(scene, c, width=64, height=16, spp=2,
                          max_depth=2, seed=3)
        return jnp.mean(img ** 2)

    loss_j = jax.jit(loss)
    g = np.asarray(jax.jit(jax.grad(loss))(cam.origin))
    assert np.isfinite(g).all() and np.abs(g).max() > 0
    # FD parity on the dominant coordinate.  eps must be SMALL: at eps
    # >= 1e-3 a sample crosses a facet silhouette inside [x-eps, x+eps]
    # and the (real, but interior-excluded) boundary term dominates the
    # quotient; at 1e-4 no flip occurs and FD matches to <1%
    # (measured: fd=0.060797 vs grad=0.060808).  Below 3e-5 fp32 loss
    # quantization takes over.
    k = int(np.abs(g).argmax())
    eps = 1e-4
    up = np.asarray(cam.origin).copy(); up[k] += eps
    dn = np.asarray(cam.origin).copy(); dn[k] -= eps
    fd = (float(loss_j(jnp.asarray(up))) - float(loss_j(jnp.asarray(dn)))) / (2 * eps)
    assert abs(fd - g[k]) <= max(5e-4, 0.1 * abs(fd)), (fd, g[k])


@pytest.mark.slow
def test_mesh_material_gradients_match_fd_through_bvh():
    """FD parity for the mesh material's albedo on a BVH mesh scene
    (VERDICT r2: no grad test touched a BVH scene at all)."""
    from spira_tpu.core.types import replace as dc_replace
    from spira_tpu.render import render_flat
    from spira_tpu.scene.camera import make_camera

    scene = st.create_mesh_scene(subdivisions=2)
    cam = make_camera(lookfrom=(0.0, 1.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      aspect_ratio=4.0)
    target = jnp.full((64 * 16, 3), 0.25, jnp.float32)

    def loss(albedo):
        mats = dc_replace(scene.materials, albedo=albedo)
        sc = dc_replace(scene, materials=mats)
        img = render_flat(sc, cam, width=64, height=16, spp=2,
                          max_depth=2, seed=3)
        return jnp.mean((img - target) ** 2)

    loss_j = jax.jit(loss)
    g = np.asarray(jax.jit(jax.grad(loss))(scene.materials.albedo))
    assert np.isfinite(g).all()
    assert np.abs(g[0]).max() > 0  # mesh material is visible
    a = np.asarray(scene.materials.albedo, np.float64)
    eps = 2e-3
    for (i, j) in [(0, 0), (0, 2), (1, 1)]:
        ap = a.copy(); ap[i, j] += eps
        am = a.copy(); am[i, j] -= eps
        fd = (float(loss_j(jnp.asarray(ap, jnp.float32)))
              - float(loss_j(jnp.asarray(am, jnp.float32)))) / (2 * eps)
        an = float(g[i, j])
        # albedo is a continuous (non-silhouette) parameter: tight parity
        assert abs(fd - an) <= max(2e-3, 0.06 * abs(fd)), (i, j, fd, an)


@pytest.mark.slow
def test_geometry_gradients_match_fd_through_bvh_traversal():
    """d(hit distance)/d(vertex positions) through the BVH traversal: FD
    parity at the intersect level.  (A radiometric loss has zero *interior*
    derivative w.r.t. v0 in this estimator — flat-shaded normals come from
    an independent table, so vertex positions only shift discrete
    visibility events.  The differentiable geometry quantity is the depth
    map, which the winner-recompute makes exact.)"""
    from spira_tpu.accel.traverse import intersect_bvh
    from spira_tpu.core.types import replace as dc_replace
    from spira_tpu.scene.camera import generate_rays, make_camera
    from spira_tpu.core import rng as srng

    scene = st.create_mesh_scene(subdivisions=2)
    cam = make_camera(lookfrom=(0.0, 1.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      aspect_ratio=2.0)
    origins, dirs = generate_rays(
        cam, 32, 16, srng.base_key(9), inclusive_uv=True
    )

    def depth_sum(v0):
        tris = dc_replace(scene.triangles, v0=v0)
        hit = intersect_bvh(scene.bvh, tris, origins, dirs)
        return jnp.sum(jnp.where(hit.hit, hit.t, 0.0))

    g = np.asarray(jax.jit(jax.grad(depth_sum))(scene.triangles.v0))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0
    f = jax.jit(depth_sum)
    v = np.asarray(scene.triangles.v0, np.float64)
    flat = np.abs(g).ravel()
    for idx in np.argsort(flat)[-3:]:
        i, j = divmod(int(idx), 3)
        eps = 1e-4
        up = v.copy(); up[i, j] += eps
        dn = v.copy(); dn[i, j] -= eps
        fd = (float(f(jnp.asarray(up, jnp.float32)))
              - float(f(jnp.asarray(dn, jnp.float32)))) / (2 * eps)
        an = float(g[i, j])
        assert abs(fd - an) <= max(1e-2, 0.05 * abs(fd)), (i, j, fd, an)

    # camera-origin depth gradients flow through the same recompute
    g_cam = np.asarray(
        jax.jit(jax.grad(
            lambda o: jnp.sum(jnp.where(
                intersect_bvh(scene.bvh, scene.triangles, origins + o,
                              dirs).hit,
                intersect_bvh(scene.bvh, scene.triangles, origins + o,
                              dirs).t, 0.0))
        ))(jnp.zeros(3, jnp.float32))
    )
    assert np.isfinite(g_cam).all() and np.abs(g_cam).max() > 0


@pytest.mark.slow
def test_shading_normal_gradients_flow_through_bvh_render():
    """Render-level geometry-shading gradients: d(loss)/d(normal table) is
    finite and nonzero through the BVH path (normals steer the scatter
    lobe, so they carry the interior geometric sensitivity)."""
    from spira_tpu.core.types import replace as dc_replace
    from spira_tpu.render import render_flat
    from spira_tpu.scene.camera import make_camera

    scene = st.create_mesh_scene(subdivisions=2)
    cam = make_camera(lookfrom=(0.0, 1.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      aspect_ratio=4.0)

    def loss(normal):
        tris = dc_replace(scene.triangles, normal=normal)
        sc = dc_replace(scene, triangles=tris)
        img = render_flat(sc, cam, width=64, height=16, spp=2,
                          max_depth=2, seed=3)
        return jnp.mean(img ** 2)

    g = np.asarray(jax.jit(jax.grad(loss))(scene.triangles.normal))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0


@pytest.mark.slow
def test_hybrid_mesh_grad_forward_is_packet_backward_is_wavefront():
    """The mesh hybrid (`render_flat_hybrid_grad_mesh`): forward value is
    exactly the packet-BVH Pallas render; its custom_vjp gradient is
    exactly the wavefront replay's gradient (independent-stream unbiased
    estimator of the expected-loss gradient)."""
    from spira_tpu.accel.pairs import attach_packed
    from spira_tpu.kernels.bvh_megakernel import render_flat_bvh_megakernel
    from spira_tpu.render import render_flat, render_flat_hybrid_grad_mesh
    from spira_tpu.scene.camera import make_camera
    from spira_tpu.scene.scene import create_mesh_scene

    scene = attach_packed(create_mesh_scene(subdivisions=1))
    cam = make_camera(lookfrom=(0.0, 1.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      aspect_ratio=128.0 / 16.0)
    kw = dict(width=128, height=16, spp=2, max_depth=2, seed=3)

    # forward: bit-identical to the packet engine
    val = np.asarray(render_flat_hybrid_grad_mesh(
        scene, cam, engine="pallas_bvh_interpret", **kw))
    direct = np.asarray(render_flat_bvh_megakernel(
        scene, cam, interpret=True, **kw))
    np.testing.assert_array_equal(val, direct)

    # backward: identical to grad of the wavefront replay
    from spira_tpu.core.types import replace

    def with_albedo(albedo):
        return replace(scene, materials=replace(scene.materials,
                                                albedo=albedo))

    def loss_hybrid(albedo):
        img = render_flat_hybrid_grad_mesh(
            with_albedo(albedo), cam, engine="pallas_bvh_interpret", **kw)
        return jnp.mean(img)

    def loss_replay(albedo):
        img = render_flat(with_albedo(albedo), cam, semantics="physical",
                          **kw)
        return jnp.mean(img)

    a0 = scene.materials.albedo
    gh = np.asarray(jax.grad(loss_hybrid)(a0))
    gr = np.asarray(jax.grad(loss_replay)(a0))
    assert np.abs(gh).max() > 0
    np.testing.assert_allclose(gh, gr, rtol=1e-6)


def test_packet_backward_matches_wavefront_backward_bitwise():
    """The differentiable packet intersect hook
    (`make_sorted_tile_intersect(grad=True)`) — the mesh hybrid's TPU
    backward — produces BITWISE-identical gradients to the stackless
    wavefront replay: same threefry streams, same winner, same
    differentiable hit recompute; only the traversal implementation
    differs (stop-gradient Pallas kernel vs stop-gradient XLA
    while_loop).  Round-4 regression guard: the stackless walk faults
    the real chip on mesh scenes, so the packet hook is the backward
    actually measured on hardware."""
    from spira_tpu.accel.bvh import build_bvh
    from spira_tpu.accel.pairs import attach_packed
    from spira_tpu.core.types import replace as dc_replace
    from spira_tpu.render import render_flat, render_flat_hybrid_grad_mesh
    from spira_tpu.scene.camera import make_camera
    from spira_tpu.scene.geometry import triangle_bounds
    from spira_tpu.scene.scene import create_mesh_scene

    # leaf<=4 rebuild: the wavefront side's compile scales with
    # (chunk x leaf unroll) — same budget trick as the fast FD test
    scene = create_mesh_scene(subdivisions=0)
    lo, hi = triangle_bounds(scene.triangles)
    scene = attach_packed(dc_replace(
        scene, bvh=build_bvh(np.asarray(lo), np.asarray(hi), leaf_size=4)
    ))
    cam = make_camera(lookfrom=(0.0, 1.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      aspect_ratio=48.0 / 8.0)
    kw = dict(width=48, height=8, spp=1, max_depth=2, seed=3)

    # linear loss: the custom_vjp cotangent is constant, so the hybrid's
    # backward must equal the wavefront grad exactly (a nonlinear loss
    # would mix in the forward image, which uses a different RNG family)
    def loss_packet(albedo, origin):
        sc = dc_replace(scene,
                        materials=dc_replace(scene.materials, albedo=albedo))
        c = dc_replace(cam, origin=origin)
        img = render_flat_hybrid_grad_mesh(
            sc, c, engine="pallas_bvh_interpret", bwd="packet_interpret",
            **kw)
        return jnp.mean(img)

    def loss_wavefront(albedo, origin):
        sc = dc_replace(scene,
                        materials=dc_replace(scene.materials, albedo=albedo))
        c = dc_replace(cam, origin=origin)
        img = render_flat(sc, c, semantics="physical", **kw)
        return jnp.mean(img)

    a0, o0 = scene.materials.albedo, cam.origin
    gp = jax.grad(loss_packet, argnums=(0, 1))(a0, o0)
    gw = jax.grad(loss_wavefront, argnums=(0, 1))(a0, o0)
    ga_p, go_p = np.asarray(gp[0]), np.asarray(gp[1])
    ga_w, go_w = np.asarray(gw[0]), np.asarray(gw[1])
    assert np.abs(ga_p).max() > 0 and np.abs(go_p).max() > 0
    np.testing.assert_array_equal(ga_p, ga_w)
    np.testing.assert_array_equal(go_p, go_w)


def test_spectral_mesh_hybrid_forward_and_spd_gradients():
    """The SPECTRAL mesh hybrid (`render_flat_hybrid_grad_mesh(spectral=
    True)`): forward is bitwise the spectral packet kernel; its backward
    (spectral replay through the differentiable packet hook) matches the
    spectral wavefront replay's albedo-SPD gradient (linear loss -> the
    custom_vjp cotangent is constant).  BASELINE configs 2+3+4 combined —
    round-4 deliverable (VERDICT r3 item 4)."""
    from spira_tpu.accel.bvh import build_bvh
    from spira_tpu.accel.pairs import attach_packed
    from spira_tpu.core.types import replace as dc_replace
    from spira_tpu.kernels.spectral_bvh import (
        render_flat_spectral_bvh_megakernel,
    )
    from spira_tpu.render import render_flat, render_flat_hybrid_grad_mesh
    from spira_tpu.scene.camera import make_camera
    from spira_tpu.scene.geometry import triangle_bounds
    from spira_tpu.scene.scene import create_mesh_scene

    scene = create_mesh_scene(subdivisions=0)
    lo, hi = triangle_bounds(scene.triangles)
    scene = attach_packed(dc_replace(
        scene, bvh=build_bvh(np.asarray(lo), np.asarray(hi), leaf_size=4)
    ))
    cam = make_camera(lookfrom=(0.0, 1.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      aspect_ratio=48.0 / 8.0)
    kw = dict(width=48, height=8, spp=1, max_depth=2, seed=3)

    v_hybrid = np.asarray(render_flat_hybrid_grad_mesh(
        scene, cam, engine="pallas_bvh_interpret", bwd="packet_interpret",
        spectral=True, **kw))
    v_direct = np.asarray(render_flat_spectral_bvh_megakernel(
        scene, cam, interpret=True, **kw))
    np.testing.assert_array_equal(v_hybrid, v_direct)

    def loss_h(spd):
        sc = dc_replace(scene, materials=dc_replace(
            scene.materials, albedo_spd=spd))
        return jnp.mean(render_flat_hybrid_grad_mesh(
            sc, cam, engine="pallas_bvh_interpret", bwd="packet_interpret",
            spectral=True, **kw))

    def loss_w(spd):
        sc = dc_replace(scene, materials=dc_replace(
            scene.materials, albedo_spd=spd))
        return jnp.mean(render_flat(sc, cam, semantics="physical",
                                    spectral=True, **kw))

    s0 = scene.materials.albedo_spd
    gh = np.asarray(jax.grad(loss_h)(s0))
    gw = np.asarray(jax.grad(loss_w)(s0))
    assert np.abs(gh).max() > 0
    np.testing.assert_allclose(gh, gw, atol=1e-8, rtol=1e-5)


def test_fd_parity_spectral_mesh_albedo_spd():
    """FD gradient parity for a MESH material's albedo SPD through the
    spectral estimator + BVH traversal (VERDICT r3 item 4: 'one FD test
    on a spectral mesh material').  One jitted value_and_grad serves both
    the analytic gradient and the FD probes."""
    from spira_tpu.accel.bvh import build_bvh
    from spira_tpu.core.types import replace as dc_replace
    from spira_tpu.render import render_flat
    from spira_tpu.scene.camera import make_camera
    from spira_tpu.scene.geometry import triangle_bounds
    from spira_tpu.scene.scene import create_mesh_scene

    scene = create_mesh_scene(subdivisions=0)
    lo, hi = triangle_bounds(scene.triangles)
    scene = dc_replace(
        scene, bvh=build_bvh(np.asarray(lo), np.asarray(hi), leaf_size=4)
    )
    cam = make_camera(lookfrom=(0.0, 1.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      aspect_ratio=6.0)

    def loss(spd):
        sc = dc_replace(scene, materials=dc_replace(
            scene.materials, albedo_spd=spd))
        img = render_flat(sc, cam, width=48, height=8, spp=1,
                          max_depth=2, seed=3, spectral=True)
        return jnp.mean(img ** 2)

    vag = jax.jit(jax.value_and_grad(loss))
    s0 = scene.materials.albedo_spd
    _, g = vag(s0)
    g = np.asarray(g)
    assert np.isfinite(g).all() and np.abs(g).max() > 0
    # mesh material is index 0; probe its dominant SPD bin
    i, j = np.unravel_index(np.abs(g).argmax(), g.shape)
    s64 = np.asarray(s0, np.float64)
    eps = 2e-3
    sp = s64.copy(); sp[i, j] += eps
    sm = s64.copy(); sm[i, j] -= eps
    fd = (float(vag(jnp.asarray(sp, jnp.float32))[0])
          - float(vag(jnp.asarray(sm, jnp.float32))[0])) / (2 * eps)
    assert abs(fd - g[i, j]) <= max(2e-3, 0.05 * abs(fd)), (fd, g[i, j])


@pytest.mark.slow
def test_spectral_spd_fd_parity_two_level_multimesh():
    """FD parity for a SPECTRAL SPD parameter through a bunny-class scene
    STRUCTURE — multi-part mesh under a two-level BVH (the procedural
    bunny's anatomy at test-size subdivisions), spectral transport, SPD
    albedo gradients (VERDICT r4 item 4's missing FD assert; the 73k-tri
    throughput row lives in the round-5 battery, this pins correctness of
    the same code path)."""
    from spira_tpu.accel.bvh import build_two_level
    from spira_tpu.core.types import replace as dc_replace
    from spira_tpu.render import render_flat
    from spira_tpu.scene.bunny import _part
    from spira_tpu.scene.camera import make_camera
    from spira_tpu.scene.geometry import make_spheres
    from spira_tpu.scene.materials import make_materials
    from spira_tpu.scene.scene import make_scene

    parts = [
        _part(1, (0.5, 0.4, 0.6), (8, 0, 0), (0.0, 0.35, 0.0), 0),
        _part(1, (0.25, 0.25, 0.3), (0, 0, 0), (0.0, 0.75, 0.45), 0),
        _part(0, (0.1, 0.3, 0.12), (18, 0, 8), (-0.1, 1.1, 0.35), 0,
              squash=0.6),
    ]
    bvh, tris = build_two_level(parts, leaf_size=4)
    materials = make_materials([
        dict(albedo=(0.7, 0.3, 0.3), metallic=0.0, roughness=0.5),
        dict(albedo=(0.5, 0.5, 0.5), metallic=0.0, roughness=0.9),
        dict(albedo=(1.0, 1.0, 1.0), emission=(5.0, 5.0, 5.0)),
    ])
    spheres = make_spheres([
        ((0.0, -100.5, 0.0), 100.0, 1),
        ((0.0, 5.0, 0.0), 1.0, 2),
    ])
    scene = make_scene(spheres=spheres, triangles=tris,
                       materials=materials, bvh=bvh)
    cam = make_camera(lookfrom=(0.0, 1.0, 3.0), lookat=(0.0, 0.4, 0.0),
                      aspect_ratio=6.0)

    def loss(spd):
        sc = dc_replace(
            scene, materials=dc_replace(scene.materials, albedo_spd=spd)
        )
        img = render_flat(sc, cam, width=48, height=8, spp=1, max_depth=2,
                          seed=3, spectral=True)
        return jnp.mean(img ** 2)

    vag = jax.jit(jax.value_and_grad(loss))
    s0 = scene.materials.albedo_spd
    _, g = vag(s0)
    g = np.asarray(g)
    assert np.isfinite(g).all() and np.abs(g).max() > 0

    # SPD albedo is a continuous parameter: tight central-difference parity
    # on the dominant bin
    i, j = np.unravel_index(np.abs(g).argmax(), g.shape)
    eps = 2e-3
    s64 = np.asarray(s0, np.float64)
    sp = s64.copy(); sp[i, j] += eps
    sm = s64.copy(); sm[i, j] -= eps
    fd = (float(vag(jnp.asarray(sp, jnp.float32))[0])
          - float(vag(jnp.asarray(sm, jnp.float32))[0])) / (2 * eps)
    assert abs(fd - g[i, j]) <= max(2e-3, 0.05 * abs(fd)), (fd, g[i, j])
