import numpy as np

from squeezedet_tpu.core.anchors import generate_anchors
from squeezedet_tpu.core.boxes import xywh_to_xyxy
from squeezedet_tpu.core.matching import encode_annotations, match_anchors

SEEDS = np.array([[34, 30], [75, 45], [38, 90]], dtype=np.float32)
ANCHORS = generate_anchors((6, 10), (96, 160), SEEDS)


def test_perfect_match_zero_deltas():
    # a GT box exactly equal to an anchor gets that anchor with ~zero deltas
    anchor_xyxy = xywh_to_xyxy(ANCHORS[[42]])
    deltas, idx = match_anchors(anchor_xyxy, ANCHORS)
    assert idx[0] == 42
    np.testing.assert_allclose(deltas, np.zeros((1, 4)), atol=1e-6)


def test_duplicate_boxes_get_unique_anchors():
    anchor_xyxy = xywh_to_xyxy(ANCHORS[[42]])
    two = np.concatenate([anchor_xyxy, anchor_xyxy], axis=0)
    _, idx = match_anchors(two, ANCHORS)
    assert idx[0] == 42
    assert idx[1] != 42
    assert len(set(idx.tolist())) == 2


def test_delta_encode_decode_roundtrip():
    rng = np.random.default_rng(7)
    x1 = rng.uniform(0, 80, (5, 1))
    y1 = rng.uniform(0, 40, (5, 1))
    w = rng.uniform(10, 60, (5, 1))
    h = rng.uniform(10, 40, (5, 1))
    boxes = np.concatenate([x1, y1, x1 + w, y1 + h], axis=1)

    deltas, idx = match_anchors(boxes, ANCHORS)
    a = ANCHORS[idx]
    # decode: x = ax + aw*dx, w = aw*exp(dw)
    cx = a[:, 0] + a[:, 2] * deltas[:, 0]
    cy = a[:, 1] + a[:, 3] * deltas[:, 1]
    dw = a[:, 2] * np.exp(deltas[:, 2])
    dh = a[:, 3] * np.exp(deltas[:, 3])
    decoded = xywh_to_xyxy(np.stack([cx, cy, dw, dh], axis=1))
    np.testing.assert_allclose(decoded, boxes, rtol=1e-4, atol=1e-3)


def test_zero_overlap_falls_back_to_nearest():
    # a 1x1-ish box far from all anchor extents still gets an anchor
    box = np.array([[0.0, 0.0, 1.0, 1.0]])
    _, idx = match_anchors(box, ANCHORS)
    assert 0 <= idx[0] < ANCHORS.shape[0]


def test_encode_annotations_layout():
    boxes = xywh_to_xyxy(ANCHORS[[10, 100]])
    class_ids = np.array([0, 2])
    gt = encode_annotations(class_ids, boxes, ANCHORS, num_classes=3)
    assert gt.shape == (ANCHORS.shape[0], 12)
    assert gt[10, 0] == 1.0 and gt[100, 0] == 1.0
    assert gt[:, 0].sum() == 2.0
    np.testing.assert_allclose(gt[10, 1:5], boxes[0])
    assert gt[10, 9] == 1.0  # class 0 one-hot
    assert gt[100, 11] == 1.0  # class 2 one-hot


def test_encode_annotations_empty():
    gt = encode_annotations(
        np.zeros((0,), dtype=np.int16), np.zeros((0, 4)), ANCHORS, num_classes=3
    )
    assert gt.shape == (ANCHORS.shape[0], 12)
    assert np.all(gt == 0)
