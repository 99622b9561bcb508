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


def test_unflip_boxes_hand_and_involution():
    from squeezedet_tpu.ops.postprocess import unflip_boxes

    boxes = jnp.asarray(
        np.array([[10.0, 5.0, 30.0, 25.0], [0.0, 0.0, 63.0, 63.0]], np.float32)
    )
    un = np.asarray(unflip_boxes(boxes, 64))
    # matches the host flip convention (core/image.py:118-122)
    np.testing.assert_allclose(un[0], [33.0, 5.0, 53.0, 25.0], atol=1e-5)
    np.testing.assert_allclose(un[1], [0.0, 0.0, 63.0, 63.0], atol=1e-5)
    # involution
    np.testing.assert_allclose(
        np.asarray(unflip_boxes(unflip_boxes(boxes, 64), 64)),
        np.asarray(boxes),
        atol=1e-5,
    )


def test_tta_flip_with_empty_second_pass_equals_plain():
    """If the mirrored pass contributes only background-level candidates,
    TTA survivors must equal the plain postprocess survivors exactly."""
    from squeezedet_tpu.core.anchors import generate_anchors
    from squeezedet_tpu.ops.postprocess import postprocess_tta_flip

    seeds = np.array([[20, 20]], dtype=np.float32)
    anchors = generate_anchors((4, 4), (64, 64), seeds)
    pred = np.full((1, 16, 8), -8.0, dtype=np.float32)
    pred[0, 0] = [5, -5, -5, 6, 0, 0, 0, 0]
    pred[0, 1] = [5, -5, -5, 4, -0.4, 0, 0, 0]
    pred[0, 15] = [-5, 5, -5, 5, 0, 0, 0, 0]
    pred_flip = np.full((1, 16, 8), -8.0, dtype=np.float32)

    kw = dict(input_size=(64, 64), num_classes=3, top_k=16,
              nms_thresh=0.4, score_thresh=0.3)
    plain = postprocess(jnp.asarray(pred), jnp.asarray(anchors), **kw)
    tta = postprocess_tta_flip(
        jnp.asarray(pred), jnp.asarray(pred_flip), jnp.asarray(anchors), **kw
    )

    def survivors(out):
        keep = np.asarray(out["keep"])[0]
        order = np.argsort(-np.asarray(out["scores"])[0][keep])
        return (
            np.asarray(out["boxes"])[0][keep][order],
            np.asarray(out["scores"])[0][keep][order],
            np.asarray(out["class_ids"])[0][keep][order],
        )

    pb, ps, pc = survivors(plain)
    tb, ts, tc = survivors(tta)
    assert len(ps) == len(ts) == 2
    np.testing.assert_allclose(tb, pb, atol=1e-5)
    np.testing.assert_allclose(ts, ps, atol=1e-6)
    np.testing.assert_array_equal(tc, pc)


def test_predict_step_tta_flip_equivariance():
    """TTA output is mirror-equivariant by construction: running the step
    on the mirrored batch must give identical scores/classes/keep and
    mirrored boxes."""
    from squeezedet_tpu.core.anchors import generate_anchors
    from squeezedet_tpu.models.squeezedet import ModelSpec, init_params
    from squeezedet_tpu.ops.postprocess import unflip_boxes
    from squeezedet_tpu.parallel.train import TaskSpec, make_predict_step_tta

    seeds = np.array([[20, 20], [40, 30]], dtype=np.float32)
    anchors = jnp.asarray(generate_anchors((4, 8), (64, 128), seeds))
    # he init: the reference gaussian init leaves the net nearly dead, so
    # both passes would decode bias-driven constants and the mirror
    # structure would be hidden behind index tie-breaking
    spec = ModelSpec(anchors_per_grid=2, init_scheme="he")
    task = TaskSpec(model=spec, input_size=(64, 128),
                    num_anchors=int(anchors.shape[0]))
    params = init_params(jax.random.PRNGKey(0), spec)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 128, 3))

    step = make_predict_step_tta(task)
    out1 = jax.device_get(step(params, img, anchors))
    out2 = jax.device_get(step(params, img[:, :, ::-1, :], anchors))

    np.testing.assert_allclose(out2["scores"], out1["scores"], atol=1e-5)
    np.testing.assert_array_equal(out2["keep"], out1["keep"])
    np.testing.assert_array_equal(out2["class_ids"], out1["class_ids"])
    np.testing.assert_allclose(
        out2["boxes"],
        np.asarray(unflip_boxes(jnp.asarray(out1["boxes"]), 128)),
        atol=1e-3,
    )
