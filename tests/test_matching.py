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


# ---- multi-positive matching (--match_iou) --------------------------------

def _decode(anchor_xywh, deltas):
    cx = anchor_xywh[0] + anchor_xywh[2] * deltas[0]
    cy = anchor_xywh[1] + anchor_xywh[3] * deltas[1]
    w = anchor_xywh[2] * np.exp(deltas[2])
    h = anchor_xywh[3] * np.exp(deltas[3])
    return xywh_to_xyxy(np.array([[cx, cy, w, h]]))[0]


def test_match_iou_zero_is_exact_parity():
    rng = np.random.default_rng(3)
    x1 = rng.uniform(0, 100, (6, 1))
    y1 = rng.uniform(0, 50, (6, 1))
    boxes = np.concatenate(
        [x1, y1, x1 + rng.uniform(8, 50, (6, 1)), y1 + rng.uniform(8, 40, (6, 1))],
        axis=1,
    ).astype(np.float32)
    cls = rng.integers(0, 3, 6)
    a = encode_annotations(cls, boxes, ANCHORS, 3)
    b = encode_annotations(cls, boxes, ANCHORS, 3, match_iou=0.0)
    np.testing.assert_array_equal(a, b)


def test_multi_positive_extras_match_iou_oracle():
    from squeezedet_tpu.core.boxes import compute_overlaps_one

    boxes = xywh_to_xyxy(ANCHORS[[42]]).astype(np.float32)
    iou = compute_overlaps_one(xywh_to_xyxy(ANCHORS), boxes[0])
    # pick a threshold that provably admits several extra anchors
    thresh = float(np.sort(iou)[-4])
    assert thresh > 0

    gt0 = encode_annotations(np.array([1]), boxes, ANCHORS, 3)
    gt = encode_annotations(np.array([1]), boxes, ANCHORS, 3, match_iou=thresh)

    # the greedy-unique row is untouched
    np.testing.assert_array_equal(gt[42], gt0[42])
    positives = np.nonzero(gt[:, 0] == 1.0)[0]
    expected = set(np.nonzero(iou >= thresh)[0].tolist()) | {42}
    assert set(positives.tolist()) == expected
    assert len(positives) >= 4

    # every extra row carries the GT box, its own-anchor deltas decoding
    # back to the GT box, and the right one-hot class
    for i in positives:
        np.testing.assert_allclose(gt[i, 1:5], boxes[0], atol=1e-4)
        np.testing.assert_allclose(
            _decode(ANCHORS[i], gt[i, 5:9]), boxes[0], atol=1e-3
        )
        assert gt[i, 9:].tolist() == [0.0, 1.0, 0.0]


def test_multi_positive_greedy_rows_win_conflicts():
    # two identical GT boxes: greedy gives each a distinct anchor; the
    # extras pass must not reassign the second GT's anchor to the first
    # (taken anchors are excluded), and every duplicate-eligible anchor
    # goes to the FIRST slot (first-max tie-break)
    box = xywh_to_xyxy(ANCHORS[[42]]).astype(np.float32)
    two = np.concatenate([box, box], axis=0)
    cls = np.array([0, 2])
    _, idx = match_anchors(two, ANCHORS)
    gt = encode_annotations(cls, two, ANCHORS, 3, match_iou=0.4)
    assert gt[idx[0], 9] == 1.0  # slot 0 keeps class 0
    assert gt[idx[1], 11] == 1.0  # slot 1 keeps class 2
    extras = [
        i for i in np.nonzero(gt[:, 0] == 1.0)[0] if i not in set(idx.tolist())
    ]
    for i in extras:
        assert gt[i, 9] == 1.0  # extras all credit the first slot


def test_multi_positive_no_boxes():
    gt = encode_annotations(
        np.zeros((0,), np.int16), np.zeros((0, 4)), ANCHORS, 3, match_iou=0.5
    )
    assert np.all(gt == 0)
