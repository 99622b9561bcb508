import numpy as np
import pytest

from squeezedet_tpu.core import boxes as B


def test_xyxy_xywh_roundtrip():
    rng = np.random.default_rng(0)
    x1y1 = rng.uniform(0, 100, size=(32, 2))
    wh = rng.uniform(1, 50, size=(32, 2))
    xyxy = np.concatenate([x1y1, x1y1 + wh], axis=1)
    out = B.xywh_to_xyxy(B.xyxy_to_xywh(xyxy))
    np.testing.assert_allclose(out, xyxy, rtol=1e-6)


def test_xyxy_to_xywh_plus_one_convention():
    xyxy = np.array([[0.0, 0.0, 9.0, 19.0]])
    xywh = B.xyxy_to_xywh(xyxy)
    np.testing.assert_allclose(xywh, [[4.5, 9.5, 10.0, 20.0]])


def test_overlaps_hand_computed():
    boxes = np.array(
        [[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0], [20.0, 20.0, 30.0, 30.0]]
    )
    box = np.array([0.0, 0.0, 10.0, 10.0])
    iou = B.compute_overlaps_one(boxes, box)
    # exclusive-area IoU: inter 25, union 175
    np.testing.assert_allclose(iou, [1.0, 25.0 / 175.0, 0.0], atol=1e-6)


def test_boxes_postprocess_resize_inverse():
    boxes = np.array([[10.0, 20.0, 110.0, 80.0]], dtype=np.float32)
    meta = {"scales": np.array([2.0, 4.0])}  # (sy, sx)
    out = B.boxes_postprocess(boxes.copy(), meta)
    np.testing.assert_allclose(out, [[2.5, 10.0, 27.5, 40.0]])


def test_boxes_postprocess_flip_involution():
    # flipping forward then inverting recovers the original box
    w = 200
    boxes = np.array([[10.0, 20.0, 50.0, 80.0]], dtype=np.float32)
    flipped = boxes.copy()
    widths = flipped[:, 2] - flipped[:, 0]
    flipped[:, 0] = w - 1 - boxes[:, 2]
    flipped[:, 2] = flipped[:, 0] + widths
    meta = {"flipped": True, "orig_size": np.array([100, w, 3])}
    out = B.boxes_postprocess(flipped, meta)
    np.testing.assert_allclose(out, boxes)


def test_boxes_postprocess_full_chain():
    # drift(+5,+8) -> resize(x2 in y, x3 in x): invert back exactly
    orig = np.array([[16.0, 10.0, 40.0, 30.0]], dtype=np.float32)
    drifted = orig.copy()
    drifted[:, [0, 2]] -= 8
    drifted[:, [1, 3]] -= 5
    resized = drifted.copy()
    resized[:, [0, 2]] *= 3.0
    resized[:, [1, 3]] *= 2.0
    meta = {
        "scales": np.array([2.0, 3.0]),
        "drifts": np.array([5, 8]),
    }
    out = B.boxes_postprocess(resized, meta)
    np.testing.assert_allclose(out, orig, rtol=1e-6)
