import numpy as np
import jax.numpy as jnp

from spira_tpu.io import image as img_io


def test_assemble_flips_vertically():
    flat = jnp.arange(2 * 3 * 3, dtype=jnp.float32).reshape(6, 3)
    img = np.asarray(img_io.assemble_image(flat, width=3, height=2))
    # bottom row of the buffer (first W entries) becomes the last image row
    np.testing.assert_array_equal(img[1, 0], np.asarray(flat[0]))
    np.testing.assert_array_equal(img[0, 0], np.asarray(flat[3]))


def test_tonemap_gamma_is_clamp_sqrt():
    x = jnp.asarray([-1.0, 0.0, 0.25, 1.0, 4.0])
    np.testing.assert_allclose(
        np.asarray(img_io.tonemap_gamma(x)), [0.0, 0.0, 0.5, 1.0, 1.0]
    )


def test_aces_constants():
    # fixed point checks of the a..e fit used by the reference kernel
    x = jnp.asarray([0.0, 1.0])
    y = np.asarray(img_io.aces_fit(x))
    np.testing.assert_allclose(y[0], 0.0, atol=1e-7)
    np.testing.assert_allclose(y[1], (2.51 + 0.03) / (2.43 + 0.59 + 0.14), rtol=1e-6)
    assert np.all(np.asarray(img_io.tonemap_aces(jnp.linspace(0, 10, 50))) <= 1.0)


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    p = str(tmp_path / "t.png")
    img_io.save_png(p, img)
    from PIL import Image

    back = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(back, img)


def test_png_pure_python_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    p = str(tmp_path / "t2.png")
    img_io._save_png_pure(p, img)
    from PIL import Image

    back = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(back, img)


def test_exr_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    hdr = rng.uniform(0, 8, size=(5, 9, 3)).astype(np.float32)
    p = str(tmp_path / "t.exr")
    img_io.save_exr(p, hdr)
    back = img_io.load_exr(p)
    np.testing.assert_array_equal(back, hdr)


def test_ppm_write(tmp_path):
    img = np.zeros((2, 2, 3), np.uint8)
    img[0, 0] = [255, 0, 0]
    p = str(tmp_path / "t.ppm")
    img_io.save_ppm(p, img)
    raw = open(p, "rb").read()
    assert raw.startswith(b"P6\n2 2\n255\n")
    assert raw[-12:] == img.tobytes()
