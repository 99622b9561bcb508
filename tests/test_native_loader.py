import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from squeezedet_tpu.data import native_loader
from squeezedet_tpu.data.imageio import read_image

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native loader not built"
)


@pytest.fixture()
def png_path(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    path = str(tmp_path / "img.png")
    cv2.imwrite(path, img[:, :, ::-1])  # cv2 writes BGR
    return path, img


def test_read_png_matches_cv2(png_path):
    path, img = png_path
    got = native_loader.read_png(path)
    assert got.shape == img.shape
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got, img.astype(np.float32))


def test_read_image_prefers_native(png_path):
    path, img = png_path
    got = read_image(path)
    np.testing.assert_array_equal(got, img.astype(np.float32))


def test_load_resize_whiten_matches_cv2_pipeline(png_path):
    path, img = png_path
    mean = np.array([93.877, 98.801, 95.923], dtype=np.float32)
    std = np.array([78.782, 80.130, 81.200], dtype=np.float32)
    out_hw = (96, 160)

    got, orig = native_loader.load_resize_whiten(path, out_hw, mean, std)
    assert orig == (37, 53)
    assert got.shape == (96, 160, 3)

    want = cv2.resize(img.astype(np.float32), (160, 96))
    want = (want - mean.reshape(1, 1, 3)) / std.reshape(1, 1, 3)
    # cv2 INTER_LINEAR uses fixed-point arithmetic; allow ~1 LSB pre-whiten
    np.testing.assert_allclose(got, want, atol=2.0 / 78.0)


def test_load_resize_whiten_identity_size(png_path):
    path, img = png_path
    mean = np.zeros(3, dtype=np.float32)
    std = np.ones(3, dtype=np.float32)
    got, _ = native_loader.load_resize_whiten(path, (37, 53), mean, std)
    np.testing.assert_allclose(got, img.astype(np.float32), atol=1e-3)


def test_missing_file_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        native_loader.read_png(str(tmp_path / "nope.png"))


def test_png_size_mem(png_path):
    path, img = png_path
    data = open(path, "rb").read()
    assert native_loader.png_size_mem(data) == (37, 53)
    with pytest.raises(ValueError):
        native_loader.png_size_mem(b"not a png at all")


def test_decode_resize_u8_identity_is_exact(png_path):
    path, img = png_path
    data = open(path, "rb").read()
    got, orig = native_loader.decode_resize_u8(data, (37, 53))
    assert orig == (37, 53)
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, img)


def test_decode_resize_u8_matches_serving_cv2_path(png_path):
    """Parity vs the cv2 serving ingest (decode -> float resize -> clip ->
    uint8 truncation): identical sampling positions, so only float-vs-
    fixed-point rounding can differ — allow 1 LSB on a small pixel
    fraction."""
    path, img = png_path
    data = open(path, "rb").read()
    out_hw = (96, 160)

    got, orig = native_loader.decode_resize_u8(data, out_hw)
    assert orig == (37, 53)

    want = cv2.resize(img.astype(np.float32), (160, 96))
    want = np.clip(want, 0, 255).astype(np.uint8)
    diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.05


def test_decode_resize_u8_bad_bytes():
    with pytest.raises(ValueError):
        native_loader.decode_resize_u8(b"\x89PNG\r\n\x1a\ntruncated", (8, 8))
