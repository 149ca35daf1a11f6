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


# ----------------------------------------------------------------------------
# External-EXR reading (half floats, ZIP/ZIPS/RLE, extra channels, line order)
# ----------------------------------------------------------------------------

def _write_external_exr(
    path, hdr, *, dtype=np.float16, compression=3, channels="BGR",
    line_order=0,
):
    """Hand-encode a scanline EXR the way external tools do (half pixels,
    ZIP blocks, optional alpha) to exercise `load_exr` beyond `save_exr`'s
    uncompressed-float32 subset."""
    import struct
    import zlib

    h, w, _ = hdr.shape
    ptype = {np.float16: 1, np.float32: 2, np.uint32: 0}[dtype]
    names = sorted(channels)  # EXR stores channels alphabetically

    def attr(name, typ, data):
        return name + b"\x00" + typ + b"\x00" + struct.pack("<I", len(data)) + data

    def channel(name):
        return name.encode() + b"\x00" + struct.pack(
            "<iBBBBii", ptype, 0, 0, 0, 0, 1, 1
        )

    chl = b"".join(channel(n) for n in names) + b"\x00"
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header = b"".join(
        [
            attr(b"channels", b"chlist", chl),
            attr(b"compression", b"compression", bytes([compression])),
            attr(b"dataWindow", b"box2i", box),
            attr(b"displayWindow", b"box2i", box),
            attr(b"lineOrder", b"lineOrder", bytes([line_order])),
            attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0)),
            attr(b"screenWindowCenter", b"v2f", struct.pack("<ff", 0, 0)),
            attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0)),
            b"\x00",
        ]
    )

    def plane(name, y):
        if name == "A":
            vals = np.full(w, 1.0)
        else:
            vals = hdr[y, :, "RGB".index(name)]
        return vals.astype(dtype).tobytes()

    lines_per = {0: 1, 1: 1, 2: 1, 3: 16}[compression]
    blocks = []
    for y0b in range(0, h, lines_per):
        n_lines = min(lines_per, h - y0b)
        raw = b"".join(
            plane(n, y0b + ln) for ln in range(n_lines) for n in names
        )
        if compression in (2, 3):
            arr = np.frombuffer(raw, np.uint8)
            half = (arr.size + 1) // 2
            inter = np.concatenate([arr[0::2], arr[1::2]])
            d = inter.astype(np.int64)
            d[1:] = (d[1:] - d[:-1] + 128) % 256
            comp = zlib.compress(d.astype(np.uint8).tobytes())
            raw = comp if len(comp) < len(raw) else raw
        blocks.append((y0b, raw))

    magic = struct.pack("<II", 20000630, 2)
    offset_pos = len(magic) + len(header)
    first = offset_pos + 8 * len(blocks)
    offsets, pos = [], first
    for _, raw in blocks:
        offsets.append(struct.pack("<Q", pos))
        pos += 8 + len(raw)
    with open(path, "wb") as f:
        f.write(magic)
        f.write(header)
        f.write(b"".join(offsets))
        for y0b, raw in blocks:
            f.write(struct.pack("<ii", y0b, len(raw)))
            f.write(raw)


def test_exr_half_zip(tmp_path):
    """ZIP-compressed half-float EXR (the common external format)."""
    rng = np.random.default_rng(5)
    hdr = rng.uniform(0, 4, size=(37, 21, 3)).astype(np.float32)
    p = str(tmp_path / "half_zip.exr")
    _write_external_exr(p, hdr, dtype=np.float16, compression=3)
    back = img_io.load_exr(p)
    np.testing.assert_allclose(back, hdr.astype(np.float16), rtol=1e-3)


def test_exr_half_zips_with_alpha(tmp_path):
    """ZIPS (per-line) + an alpha channel that must be skipped."""
    rng = np.random.default_rng(6)
    hdr = rng.uniform(0, 4, size=(6, 10, 3)).astype(np.float32)
    p = str(tmp_path / "rgba_zips.exr")
    _write_external_exr(
        p, hdr, dtype=np.float16, compression=2, channels="ABGR"
    )
    back = img_io.load_exr(p)
    np.testing.assert_allclose(back, hdr.astype(np.float16), rtol=1e-3)


def test_exr_float_zip(tmp_path):
    rng = np.random.default_rng(7)
    hdr = rng.uniform(0, 4, size=(20, 33, 3)).astype(np.float32)
    p = str(tmp_path / "f32_zip.exr")
    _write_external_exr(p, hdr, dtype=np.float32, compression=3)
    back = img_io.load_exr(p)
    np.testing.assert_array_equal(back, hdr)


def test_exr_unsupported_compression_raises(tmp_path):
    import pytest

    rng = np.random.default_rng(8)
    hdr = rng.uniform(0, 1, size=(4, 4, 3)).astype(np.float32)
    p = str(tmp_path / "piz.exr")
    _write_external_exr(p, hdr, dtype=np.float16, compression=1)  # valid RLE id...
    # overwrite compression byte with PIZ (4) to simulate unsupported input
    data = bytearray(open(p, "rb").read())
    idx = data.index(b"compression\x00compression\x00")
    data[idx + len(b"compression\x00compression\x00") + 4] = 4
    open(p, "wb").write(bytes(data))
    with pytest.raises(ValueError):
        img_io.load_exr(p)


def test_exr_decreasing_y(tmp_path):
    # chunk headers carry absolute y; lineOrder only changes chunk order in
    # the file.  Build a DECREASING_Y file by patching save_exr's output:
    # flip the lineOrder byte, reverse the chunk order, rebuild offsets.
    import struct

    rng = np.random.default_rng(3)
    hdr = rng.uniform(0, 4, size=(6, 4, 3)).astype(np.float32)
    p0 = str(tmp_path / "inc.exr")
    img_io.save_exr(p0, hdr)
    data = bytearray(open(p0, "rb").read())

    tag = b"lineOrder\x00lineOrder\x00"
    i = data.index(tag) + len(tag) + 4  # skip the attr size field
    assert data[i] == 0
    data[i] = 1  # DECREASING_Y

    h, w = hdr.shape[:2]
    chunk = 8 + 3 * 4 * w
    header_end = len(data) - h * (8 + chunk)  # offset table start
    table_end = header_end + 8 * h
    chunks = [
        bytes(data[table_end + y * chunk : table_end + (y + 1) * chunk])
        for y in range(h)
    ]
    chunks.reverse()
    offsets = b"".join(
        struct.pack("<Q", table_end + k * chunk) for k in range(h)
    )
    p1 = str(tmp_path / "dec.exr")
    with open(p1, "wb") as f:
        f.write(data[:header_end])
        f.write(offsets)
        f.write(b"".join(chunks))

    back = img_io.load_exr(p1)
    np.testing.assert_array_equal(back, hdr)
