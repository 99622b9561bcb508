import jax
import jax.numpy as jnp
import numpy as np
import pytest

from squeezedet_tpu.ops.box_ops import pairwise_iou
from squeezedet_tpu.ops.postprocess import greedy_nms_mask, postprocess

from tests.torch_oracle import greedy_nms_reference


def _random_boxes(k, seed=0, extent=100.0):
    rng = np.random.default_rng(seed)
    x1 = rng.uniform(0, extent * 0.7, (k, 1))
    y1 = rng.uniform(0, extent * 0.7, (k, 1))
    wh = rng.uniform(5, extent * 0.4, (k, 2))
    boxes = np.concatenate([x1, y1, x1 + wh[:, :1], y1 + wh[:, 1:]], axis=1)
    scores = np.sort(rng.uniform(0, 1, k))[::-1].copy()  # descending
    return boxes.astype(np.float32), scores.astype(np.float32)


def test_pairwise_iou_hand():
    boxes = np.array(
        [[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], dtype=np.float32
    )
    iou = np.asarray(pairwise_iou(jnp.asarray(boxes)))
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-5)
    np.testing.assert_allclose(iou[0, 1], 25.0 / 175.0, atol=1e-5)
    np.testing.assert_allclose(iou[0, 2], 0.0, atol=1e-7)


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("thresh", [0.3, 0.4, 0.6])
def test_single_class_nms_matches_reference(seed, thresh):
    boxes, scores = _random_boxes(64, seed)
    class_ids = np.zeros(64, dtype=np.int32)
    mask = np.asarray(
        greedy_nms_mask(jnp.asarray(boxes), jnp.asarray(class_ids), thresh)
    )
    got = sorted(np.nonzero(mask)[0].tolist())
    want = greedy_nms_reference(boxes, scores, thresh)
    assert got == want


@pytest.mark.parametrize("seed", range(3))
def test_classwise_nms_equals_per_class_reference(seed):
    boxes, scores = _random_boxes(64, seed, extent=60.0)
    rng = np.random.default_rng(seed + 100)
    class_ids = rng.integers(0, 3, 64).astype(np.int32)
    mask = np.asarray(greedy_nms_mask(jnp.asarray(boxes), jnp.asarray(class_ids), 0.4))
    got = sorted(np.nonzero(mask)[0].tolist())

    want = []
    for c in range(3):
        sel = np.nonzero(class_ids == c)[0]
        kept = greedy_nms_reference(boxes[sel], scores[sel], 0.4)
        want.extend(sel[kept].tolist())
    assert got == sorted(want)


def test_postprocess_end_to_end_tiny():
    """Craft a head output whose decode yields two overlapping high-score
    boxes of one class and one separate box of another."""
    from squeezedet_tpu.core.anchors import generate_anchors

    seeds = np.array([[20, 20]], dtype=np.float32)
    anchors = generate_anchors((4, 4), (64, 64), seeds)  # 16 anchors
    num_classes = 3
    pred = np.full((1, 16, 8), -8.0, dtype=np.float32)  # low everything

    # anchor 0: class 0 strongly, high objectness, zero deltas
    pred[0, 0] = [5, -5, -5, 6, 0, 0, 0, 0]
    # anchor 1 (adjacent cell, overlapping 20x20 box): class 0, lower score
    pred[0, 1] = [5, -5, -5, 4, -0.4, 0, 0, 0]  # shifted toward anchor 0
    # anchor 15: class 1
    pred[0, 15] = [-5, 5, -5, 5, 0, 0, 0, 0]

    out = postprocess(
        jnp.asarray(pred),
        jnp.asarray(anchors),
        input_size=(64, 64),
        num_classes=num_classes,
        top_k=16,
        nms_thresh=0.4,
        score_thresh=0.3,
    )
    keep = np.asarray(out["keep"])[0]
    boxes = np.asarray(out["boxes"])[0][keep]
    classes = np.asarray(out["class_ids"])[0][keep]
    scores = np.asarray(out["scores"])[0][keep]

    # anchor-1 box drifts onto anchor-0's box -> suppressed; 2 survivors
    assert keep.sum() == 2
    assert set(classes.tolist()) == {0, 1}
    assert np.all(scores > 0.3)
    # anchor 0 box: centred (8,8) size 20 -> clamped at 0
    np.testing.assert_allclose(boxes[0], [0.0, 0.0, 17.5, 17.5], atol=1e-4)


def test_postprocess_shapes_and_sorted():
    rng = np.random.default_rng(3)
    from squeezedet_tpu.core.anchors import generate_anchors

    seeds = np.array([[30, 30], [60, 40]], dtype=np.float32)
    anchors = generate_anchors((6, 10), (96, 160), seeds)
    pred = rng.normal(size=(2, anchors.shape[0], 8)).astype(np.float32)
    out = postprocess(
        jnp.asarray(pred),
        jnp.asarray(anchors),
        input_size=(96, 160),
        num_classes=3,
        top_k=64,
    )
    assert out["boxes"].shape == (2, 64, 4)
    assert out["scores"].shape == (2, 64)
    scores = np.asarray(out["scores"])
    assert np.all(np.diff(scores, axis=1) <= 1e-7)  # descending
