import numpy as np
import pytest

from squeezedet_tpu.core import image as I
from squeezedet_tpu.core.boxes import boxes_postprocess


class FixedRng:
    """Deterministic stand-in for np.random with scripted outputs."""

    def __init__(self, uniforms, randints=()):
        self.uniforms = list(uniforms)
        self.randints = list(randints)

    def uniform(self):
        return self.uniforms.pop(0)

    def randint(self, lo, hi):
        v = self.randints.pop(0)
        assert lo <= v < hi, (lo, v, hi)
        return v


def _image(h=48, w=64):
    return np.arange(h * w * 3, dtype=np.float32).reshape(h, w, 3)


def test_whiten_and_inverse():
    img = _image()
    meta = {}
    mean = np.array([1.0, 2.0, 3.0]).reshape(1, 1, 3)
    std = np.array([2.0, 4.0, 8.0]).reshape(1, 1, 3)
    out, meta = I.whiten(img.copy(), meta, mean, std)
    back = I.image_postprocess(out, meta)
    np.testing.assert_allclose(back, img, rtol=1e-6)


def test_flip_boxes():
    img = _image()
    boxes = np.array([[2.0, 3.0, 10.0, 20.0]])
    out, meta, fboxes = I.flip(img.copy(), {}, prob=1.0, boxes=boxes.copy(), rng=FixedRng([0.0]))
    assert meta["flipped"]
    np.testing.assert_allclose(out, img[:, ::-1, :])
    # x1' = W-1-x2 = 63-10 = 53; width preserved
    np.testing.assert_allclose(fboxes[0], [53.0, 3.0, 61.0, 20.0])
    # inverse via boxes_postprocess
    restored = boxes_postprocess(fboxes, {"flipped": True, "orig_size": np.array(img.shape)})
    np.testing.assert_allclose(restored, boxes)


def test_flip_noop():
    img = _image()
    out, meta, _ = I.flip(img.copy(), {}, prob=0.5, boxes=None, rng=FixedRng([0.9]))
    assert not meta["flipped"]
    np.testing.assert_allclose(out, img)


def test_drift_positive_shift():
    img = _image()
    boxes = np.array([[8.0, 10.0, 20.0, 30.0]])
    meta = {"orig_size": np.array(img.shape, dtype=np.int32)}
    out, meta, dboxes = I.drift(
        img.copy(), meta, prob=1.0, boxes=boxes.copy(),
        rng=FixedRng([0.0], [4, 6]),  # dy=4, dx=6
    )
    assert out.shape == (48 - 4, 64 - 6, 3)
    np.testing.assert_allclose(meta["drifts"], [4, 6])
    # content shifted: out[y, x] == img[y+4, x+6]
    np.testing.assert_allclose(out[0, 0], img[4, 6])
    np.testing.assert_allclose(dboxes[0], [2.0, 6.0, 14.0, 26.0])
    restored = boxes_postprocess(dboxes, {"drifts": meta["drifts"]})
    np.testing.assert_allclose(restored, boxes)


def test_drift_empty_boxes():
    """Images with no labeled objects (only-DontCare frames exist in real
    KITTI) must drift freely instead of crashing (the reference crashes)."""
    img = _image()
    meta = {"orig_size": np.array(img.shape, dtype=np.int32)}
    boxes = np.zeros((0, 4), dtype=np.float32)
    out, meta, dboxes = I.drift(
        img.copy(), meta, prob=1.0, boxes=boxes,
        rng=FixedRng([0.0], [4, 6]),
    )
    assert out.shape == (48 - 4, 64 - 6, 3)
    assert dboxes.shape == (0, 4)


def test_drift_negative_shift_pads():
    img = _image()
    meta = {"orig_size": np.array(img.shape, dtype=np.int32)}
    out, meta, _ = I.drift(
        img.copy(), meta, prob=1.0, boxes=None, rng=FixedRng([0.0], [-4, -6])
    )
    assert out.shape == (52, 70, 3)
    # top-left pad region is zero, content at offset
    assert np.all(out[:4, :, :] == 0)
    np.testing.assert_allclose(out[4, 6], img[0, 0])


def test_resize_scales_boxes():
    img = _image(40, 60)
    boxes = np.array([[6.0, 8.0, 30.0, 20.0]])
    out, meta, rboxes = I.resize(img.copy(), {}, (80, 180), boxes=boxes.copy())
    assert out.shape == (80, 180, 3)
    np.testing.assert_allclose(meta["scales"], [2.0, 3.0])
    np.testing.assert_allclose(rboxes[0], [18.0, 16.0, 90.0, 40.0])


def test_crop_or_pad_pads_small():
    img = _image(40, 60)
    boxes = np.array([[6.0, 8.0, 30.0, 20.0]])
    out, meta, pboxes = I.crop_or_pad(img.copy(), {}, (48, 64), boxes=boxes.copy())
    assert out.shape == (48, 64, 3)
    np.testing.assert_allclose(meta["padding"], [4, 4, 2, 2])
    np.testing.assert_allclose(meta["crops"], [0, 0, 0, 0])
    np.testing.assert_allclose(pboxes[0], [8.0, 12.0, 32.0, 24.0])
    restored = boxes_postprocess(pboxes, meta)
    np.testing.assert_allclose(restored, boxes)


def test_crop_or_pad_crops_large():
    img = _image(48, 64)
    out, meta, _ = I.crop_or_pad(img.copy(), {}, (40, 60))
    assert out.shape == (40, 60, 3)
    np.testing.assert_allclose(meta["crops"], [4, 4, 2, 2])
    np.testing.assert_allclose(out[0, 0], img[4, 2])


def test_preprocess_chain_box_consistency():
    """Boxes transformed through drift->flip->resize invert exactly through
    boxes_postprocess (the detector's un-mapping path)."""
    img = _image(48, 64)
    boxes = np.array([[8.0, 10.0, 20.0, 30.0]], dtype=np.float32)
    meta = {"orig_size": np.array(img.shape, dtype=np.int32)}

    im, meta, b = I.drift(img.copy(), meta, 1.0, boxes.copy(), rng=FixedRng([0.0], [4, 6]))
    im, meta, b = I.flip(im, meta, 1.0, b, rng=FixedRng([0.0]))
    im, meta, b = I.resize(im, meta, (96, 128), b)

    restored = boxes_postprocess(b, meta)
    np.testing.assert_allclose(restored, boxes, rtol=1e-5, atol=1e-4)
