"""Soft-NMS parity: the on-device K-step scan (ops/postprocess.py:
soft_nms_rescore) vs an independent sequential numpy oracle implementing
Bodla et al.'s algorithm directly, plus contract checks on the filtered
output (score-descending order, fixed shapes, hard path unchanged)."""

import jax.numpy as jnp
import numpy as np
import pytest

from squeezedet_tpu.ops.postprocess import (
    _filter_detections,
    greedy_nms_mask,
    soft_nms_rescore,
)


def _iou(a, b):
    """Exclusive-area IoU, the torchvision/NMS convention
    (ops/box_ops.pairwise_iou)."""
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    return inter / max(area_a + area_b - inter, 1e-12)


def soft_nms_oracle(boxes, class_ids, scores, iou_thresh, sigma, method):
    """Sequential soft-NMS, written from the paper: repeatedly select the
    highest-scoring unprocessed box, decay overlapping same-class scores."""
    scores = scores.astype(np.float64).copy()
    k = len(scores)
    processed = np.zeros(k, bool)
    for _ in range(k):
        i = int(np.argmax(np.where(processed, -1.0, scores)))
        processed[i] = True
        for j in range(k):
            if processed[j] or class_ids[j] != class_ids[i]:
                continue
            iou = _iou(boxes[i], boxes[j])
            if method == "soft_linear":
                w = 1.0 - iou if iou > iou_thresh else 1.0
            else:
                w = np.exp(-(iou**2) / sigma)
            scores[j] *= w
    return scores


def _random_scene(rng, k=32, num_classes=3):
    centers = rng.uniform(20, 300, (k, 2))
    sizes = rng.uniform(10, 80, (k, 2))
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], 1)
    class_ids = rng.integers(0, num_classes, k)
    scores = np.sort(rng.uniform(0.01, 1.0, k))[::-1].copy()  # desc
    return (
        boxes.astype(np.float32),
        class_ids.astype(np.int32),
        scores.astype(np.float32),
    )


@pytest.mark.parametrize("method", ["soft_linear", "soft_gauss"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_soft_nms_matches_sequential_oracle(method, seed):
    rng = np.random.default_rng(seed)
    boxes, class_ids, scores = _random_scene(rng)
    got = np.asarray(
        soft_nms_rescore(
            jnp.asarray(boxes), jnp.asarray(class_ids), jnp.asarray(scores),
            0.4, 0.5, method,
        )
    )
    want = soft_nms_oracle(boxes, class_ids, scores, 0.4, 0.5, method)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_soft_nms_isolated_boxes_keep_scores():
    """Non-overlapping boxes decay nothing under either method."""
    boxes = np.array(
        [[0, 0, 10, 10], [100, 100, 120, 130], [300, 5, 340, 60]], np.float32
    )
    class_ids = np.zeros(3, np.int32)
    scores = np.array([0.9, 0.5, 0.2], np.float32)
    for method in ("soft_linear", "soft_gauss"):
        out = np.asarray(
            soft_nms_rescore(
                jnp.asarray(boxes), jnp.asarray(class_ids),
                jnp.asarray(scores), 0.4, 0.5, method,
            )
        )
        np.testing.assert_allclose(out, scores, rtol=1e-6)


def test_soft_linear_duplicate_box_suppressed_like_hard():
    """A perfect duplicate (IoU 1) gets score * 0 under soft_linear — the
    same outcome hard NMS produces; different classes are untouched."""
    boxes = np.tile(np.array([[10, 10, 50, 50]], np.float32), (2, 1))
    scores = np.array([0.8, 0.6], np.float32)
    same = np.asarray(
        soft_nms_rescore(
            jnp.asarray(boxes), jnp.zeros(2, jnp.int32), jnp.asarray(scores),
            0.4, 0.5, "soft_linear",
        )
    )
    assert same[0] == pytest.approx(0.8) and same[1] == pytest.approx(0.0)
    diff = np.asarray(
        soft_nms_rescore(
            jnp.asarray(boxes), jnp.arange(2, dtype=jnp.int32),
            jnp.asarray(scores), 0.4, 0.5, "soft_linear",
        )
    )
    np.testing.assert_allclose(diff, scores)


def test_filter_detections_soft_contract_and_hard_regression():
    """The soft path returns score-descending fixed shapes; the default
    hard path is bit-identical to greedy_nms_mask's keep set."""
    rng = np.random.default_rng(7)
    boxes, class_ids, scores = _random_scene(rng, k=24)
    det = {
        "boxes": jnp.asarray(boxes)[None],
        "class_ids": jnp.asarray(class_ids)[None],
        "scores": jnp.asarray(scores)[None],
    }
    hard = _filter_detections(det, 24, 0.4, 0.1)
    mask = greedy_nms_mask(jnp.asarray(boxes), jnp.asarray(class_ids), 0.4)
    np.testing.assert_array_equal(
        np.asarray(hard["keep"][0]),
        np.asarray(mask) & (scores > 0.1),
    )

    soft = _filter_detections(det, 24, 0.4, 0.1, "soft_gauss", 0.5)
    s = np.asarray(soft["scores"][0])
    assert s.shape == (24,) and np.all(np.diff(s) <= 1e-7)  # descending
    # every surviving soft box is one of the inputs (reordered, rescored)
    kept = np.asarray(soft["boxes"][0])[np.asarray(soft["keep"][0])]
    for row in kept:
        assert any(np.allclose(row, b) for b in boxes)


def test_soft_nms_end_to_end_postprocess():
    """postprocess with nms_method=soft_gauss runs the full chain and keeps
    high-scoring well-separated objects just like hard NMS."""
    import jax

    from squeezedet_tpu.core.anchors import generate_anchors
    from squeezedet_tpu.data.kitti import KITTI_ANCHOR_SEEDS
    from squeezedet_tpu.models.squeezedet import ModelSpec, forward, init_params
    from squeezedet_tpu.ops.postprocess import postprocess

    input_size = (96, 160)
    spec = ModelSpec(num_classes=3, anchors_per_grid=9)
    params = init_params(jax.random.PRNGKey(0), spec)
    anchors = jnp.asarray(
        generate_anchors((6, 10), input_size, KITTI_ANCHOR_SEEDS)
    )
    images = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, *input_size, 3)), jnp.float32
    )
    pred = forward(params, images, spec)
    out = postprocess(
        pred, anchors, input_size=input_size, num_classes=3,
        top_k=16, nms_thresh=0.4, score_thresh=0.0,
        nms_method="soft_gauss", soft_nms_sigma=0.5,
    )
    assert out["boxes"].shape == (2, 16, 4)
    assert out["keep"].dtype == jnp.bool_
    s = np.asarray(out["scores"])
    assert np.all(np.diff(s, axis=1) <= 1e-7)
