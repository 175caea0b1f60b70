"""Native (C++) decoder goldens vs the pure-Python/imageio paths."""

import os

import numpy as np
import pytest

from ocflow_tpu.data import native_io


def _native_or_skip():
    if not native_io.available():
        pytest.skip("native decoder toolchain unavailable")


def test_native_flo_roundtrip(tmp_path):
    _native_or_skip()
    from ocflow_tpu.data.flow_io import write_flo

    rng = np.random.default_rng(0)
    flow = rng.normal(size=(17, 23, 2)).astype(np.float32)
    p = str(tmp_path / "x.flo")
    write_flo(p, flow)
    got = native_io.read_flo(p)
    np.testing.assert_array_equal(got, flow)


def test_native_png8_matches_imageio(tmp_path):
    _native_or_skip()
    import imageio.v2 as iio

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (21, 33, 3), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    iio.imwrite(p, img)
    got = native_io.read_image(p)
    np.testing.assert_array_equal(got, img)


def test_native_png16_matches_reference_decode(tmp_path):
    _native_or_skip()
    from ocflow_tpu.data.flow_io import write_kitti_png_flow

    rng = np.random.default_rng(2)
    flow = (rng.uniform(-64, 64, (11, 13, 2)) * 64).round() / 64.0
    p = str(tmp_path / "k.png")
    write_kitti_png_flow(p, flow)

    got = native_io.read_kitti_png_flow(p)
    np.testing.assert_allclose(got[..., :2], flow, atol=1e-9)
    np.testing.assert_array_equal(got[..., 2], np.ones(flow.shape[:2]))


def test_native_ppm_matches_imageio(tmp_path):
    _native_or_skip()
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (9, 14, 3), dtype=np.uint8)
    p = str(tmp_path / "x.ppm")
    with open(p, "wb") as f:
        f.write(b"P6\n# comment\n14 9\n255\n")
        f.write(img.tobytes())
    got = native_io.read_image(p)
    np.testing.assert_array_equal(got, img)

    gray = rng.integers(0, 256, (7, 5), dtype=np.uint8)
    p2 = str(tmp_path / "x.pgm")
    with open(p2, "wb") as f:
        f.write(b"P5 5 7 255\n")
        f.write(gray.tobytes())
    got2 = native_io.read_image(p2)
    np.testing.assert_array_equal(got2[..., 0], gray)


def test_read_gen_uses_native(tmp_path):
    _native_or_skip()
    from ocflow_tpu.data.frame_io import read_gen

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    import imageio.v2 as iio

    p = str(tmp_path / "f.png")
    iio.imwrite(p, img)
    np.testing.assert_array_equal(read_gen(p), img)


def test_read_pair_norm_matches_generic(tmp_path):
    """Fused decode+crop+normalize == center_crop + normalize_image +
    concatenate on the same files (both PNG and PPM), incl. odd crops."""
    import imageio.v2 as iio

    from ocflow_tpu.data.datasets import center_crop, normalize_image

    if not native_io.available():
        pytest.skip("native decoders unavailable")
    rng = np.random.default_rng(0)
    a = rng.integers(0, 255, (37, 53, 3), np.uint8)
    b = rng.integers(0, 255, (37, 53, 3), np.uint8)
    p1, p2 = str(tmp_path / "a.png"), str(tmp_path / "b.ppm")
    iio.imwrite(p1, a)
    with open(p2, "wb") as f:  # binary P6 by hand
        f.write(b"P6\n53 37\n255\n" + b.tobytes())
    th, tw = 32, 40
    got = native_io.read_pair_norm(p1, p2, th, tw)
    assert got is not None and got.shape == (th, tw, 6)
    want = np.concatenate(
        [normalize_image(center_crop(a, th, tw)),
         normalize_image(center_crop(b, th, tw))], axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_read_pair_norm_rejects_16bit(tmp_path):
    """16-bit input routes to the generic path (returns None)."""
    from ocflow_tpu.data.flow_io import write_kitti_png_flow

    if not native_io.available():
        pytest.skip("native decoders unavailable")
    p = str(tmp_path / "deep.png")  # KITTI flow pngs are 16-bit RGB
    write_kitti_png_flow(p, np.zeros((16, 16, 2), np.float32))
    assert native_io.read_pair_norm(p, p, 8, 8) is None
