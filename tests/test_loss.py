import jax
import jax.numpy as jnp
import numpy as np
import pytest

from squeezedet_tpu.core.anchors import generate_anchors
from squeezedet_tpu.core.boxes import xywh_to_xyxy
from squeezedet_tpu.core.matching import encode_annotations
from squeezedet_tpu.models.head import resolve
from squeezedet_tpu.models.loss import LossWeights, detection_loss

from tests.torch_oracle import loss_torch

SEEDS = np.array([[34, 30], [75, 45], [38, 90]], dtype=np.float32)
ANCHORS = generate_anchors((6, 10), (96, 160), SEEDS)
NUM_ANCHORS = ANCHORS.shape[0]
NUM_CLASSES = 3
INPUT_SIZE = (96, 160)


def _random_batch(batch=2, objects_per_image=3, seed=0):
    rng = np.random.default_rng(seed)
    pred = rng.normal(scale=0.5, size=(batch, NUM_ANCHORS, NUM_CLASSES + 5)).astype(
        np.float32
    )
    gts = []
    for b in range(batch):
        idx = rng.choice(NUM_ANCHORS, objects_per_image, replace=False)
        boxes = xywh_to_xyxy(ANCHORS[idx] * rng.uniform(0.9, 1.1, size=(objects_per_image, 4)))
        class_ids = rng.integers(0, NUM_CLASSES, objects_per_image)
        gts.append(encode_annotations(class_ids, boxes, ANCHORS, NUM_CLASSES))
    return pred, np.stack(gts)


def test_loss_matches_torch_oracle():
    pred, gt = _random_batch()
    weights = LossWeights()

    resolved = resolve(
        jnp.asarray(pred), jnp.asarray(ANCHORS), INPUT_SIZE, NUM_CLASSES,
        with_log_probs=True,
    )
    loss, stats = detection_loss(resolved, jnp.asarray(gt), NUM_ANCHORS, weights)

    want = loss_torch(pred, gt, ANCHORS, INPUT_SIZE, NUM_CLASSES, tuple(weights))
    for key in ("loss", "class_loss", "score_loss", "bbox_loss"):
        np.testing.assert_allclose(
            np.asarray(stats[key]), want[key], rtol=1e-4, atol=1e-5, err_msg=key
        )


def test_loss_zero_objects_is_finite():
    pred, gt = _random_batch()
    gt_empty = np.zeros_like(gt)
    resolved = resolve(
        jnp.asarray(pred), jnp.asarray(ANCHORS), INPUT_SIZE, NUM_CLASSES,
        with_log_probs=True,
    )
    loss, stats = detection_loss(resolved, jnp.asarray(gt_empty), NUM_ANCHORS)
    assert np.all(np.isfinite(np.asarray(loss)))
    # positive terms vanish; negative score loss remains
    np.testing.assert_allclose(np.asarray(stats["class_loss"]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(stats["bbox_loss"]), 0.0, atol=1e-6)
    assert np.all(np.asarray(stats["score_loss"]) > 0)


def test_loss_is_differentiable():
    pred, gt = _random_batch(batch=1)

    def f(p):
        resolved = resolve(
            p, jnp.asarray(ANCHORS), INPUT_SIZE, NUM_CLASSES, with_log_probs=True
        )
        loss, _ = detection_loss(resolved, jnp.asarray(gt[:1]), NUM_ANCHORS)
        return loss.mean()

    g = jax.grad(f)(jnp.asarray(pred[:1]))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0


# --- CIoU bbox loss (--bbox_loss ciou; models/loss.complete_iou) ---------

def test_complete_iou_properties():
    """Hand-checkable CIoU values: identical boxes -> 1; disjoint equal
    boxes -> negative (center penalty); farther -> worse; aspect mismatch
    penalized at equal IoU."""
    from squeezedet_tpu.models.loss import complete_iou
    from squeezedet_tpu.ops.box_ops import compute_overlaps

    def ciou(a, b):
        a = jnp.asarray(a, jnp.float32)[None]
        b = jnp.asarray(b, jnp.float32)[None]
        return float(complete_iou(a, b, compute_overlaps(a, b))[0, 0])

    box = [10.0, 10.0, 30.0, 40.0]
    assert ciou(box, box) == 1.0
    near = ciou(box, [14.0, 10.0, 34.0, 40.0])
    far = ciou(box, [40.0, 10.0, 60.0, 40.0])
    farther = ciou(box, [80.0, 10.0, 100.0, 40.0])
    assert 1.0 > near > far > farther
    assert far < 0.0 or farther < far  # disjoint boxes keep a gradient signal
    # same IoU=0, same center distance, different aspect -> lower CIoU
    sq = ciou([0, 0, 10, 10], [20, 0, 30, 10])
    wide = ciou([0, 0, 10, 10], [20, 2.5, 30, 7.5])
    assert wide < sq


def test_ciou_bbox_loss_zero_at_perfect_and_differentiable():
    """With predictions decoding exactly to the GT boxes the CIoU bbox
    term vanishes; gradients are finite and pull decoded boxes toward GT."""
    pred, gt = _random_batch()
    resolved = resolve(
        jnp.asarray(pred), jnp.asarray(ANCHORS), INPUT_SIZE, NUM_CLASSES,
        with_log_probs=True,
    )
    _, stats_l2 = detection_loss(resolved, jnp.asarray(gt), NUM_ANCHORS)
    _, stats_ci = detection_loss(
        resolved, jnp.asarray(gt), NUM_ANCHORS, bbox_loss_kind="ciou",
        anchors_xywh=jnp.asarray(ANCHORS),
    )
    # non-bbox terms identical, bbox term differs
    np.testing.assert_allclose(
        np.asarray(stats_l2["class_loss"]), np.asarray(stats_ci["class_loss"])
    )
    assert not np.allclose(
        np.asarray(stats_l2["bbox_loss"]), np.asarray(stats_ci["bbox_loss"])
    )

    # perfect prediction: head deltas = gt deltas -> decoded boxes == gt
    # boxes -> 1 - CIoU == 0 on every positive anchor. GT must be clipped
    # to input bounds like the real pipeline's preprocess (the resolver
    # clamps decoded boxes to [0, input-1], so an out-of-bounds GT box is
    # unreachable in box space even with exactly-matching deltas).
    h, w = INPUT_SIZE
    rng = np.random.default_rng(0)
    gts = []
    for b in range(2):
        idx = rng.choice(NUM_ANCHORS, 3, replace=False)
        boxes = xywh_to_xyxy(
            ANCHORS[idx] * rng.uniform(0.9, 1.1, size=(3, 4))
        )
        boxes = np.clip(boxes, [0, 0, 0, 0], [w - 1, h - 1, w - 1, h - 1])
        class_ids = rng.integers(0, NUM_CLASSES, 3)
        gts.append(encode_annotations(class_ids, boxes, ANCHORS, NUM_CLASSES))
    gt_j = jnp.asarray(np.stack(gts))
    perfect = jnp.asarray(pred).at[..., -4:].set(gt_j[..., 5:9])
    resolved_p = resolve(
        perfect, jnp.asarray(ANCHORS), INPUT_SIZE, NUM_CLASSES,
        with_log_probs=True,
    )
    _, stats_p = detection_loss(
        resolved_p, gt_j, NUM_ANCHORS, bbox_loss_kind="ciou",
        anchors_xywh=jnp.asarray(ANCHORS),
    )
    np.testing.assert_allclose(
        np.asarray(stats_p["bbox_loss"]), 0.0, atol=1e-4
    )

    def bbox_term(p):
        r = resolve(p, jnp.asarray(ANCHORS), INPUT_SIZE, NUM_CLASSES,
                    with_log_probs=True)
        _, s = detection_loss(r, gt_j, NUM_ANCHORS, bbox_loss_kind="ciou",
                              anchors_xywh=jnp.asarray(ANCHORS))
        return s["bbox_loss"].sum()

    g = jax.grad(bbox_term)(jnp.asarray(pred))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0.0
    # one gradient step on the deltas must reduce the CIoU bbox term
    stepped = jnp.asarray(pred) - 0.05 * g
    assert float(bbox_term(stepped)) < float(bbox_term(jnp.asarray(pred)))


def test_ciou_train_step_descends():
    """Full jitted train step with bbox_loss_kind='ciou' descends."""
    from squeezedet_tpu.models.squeezedet import ModelSpec, init_params
    from squeezedet_tpu.parallel.train import (
        TaskSpec, init_train_state, make_train_step,
    )

    task = TaskSpec(
        model=ModelSpec(arch="squeezedet", num_classes=3, anchors_per_grid=3,
                        dropout_prob=0.0),
        input_size=INPUT_SIZE,
        num_anchors=NUM_ANCHORS,
        bbox_loss_kind="ciou",
    )
    params = init_params(jax.random.PRNGKey(0), task.model)
    state = init_train_state(params, task)
    step = make_train_step(task)
    _, gt = _random_batch(batch=2, seed=3)
    images = np.random.default_rng(4).normal(
        size=(2, *INPUT_SIZE, 3)
    ).astype(np.float32)
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(6):
        state, stats = step(
            state, jnp.asarray(images), jnp.asarray(gt),
            jnp.asarray(ANCHORS), 0.01, key,
        )
        losses.append(float(stats["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_ciou_grad_finite_with_escaped_boxes():
    """Regression for the exp/ciou600 step-1 NaN (2026-08-19): a predicted
    box that decodes FULLY outside the image used to be clamped to a
    zero-size corner point, where arctan2(0, 0)'s backward is 0/0 = NaN —
    and a NaN at even a mask=0 anchor poisons the whole gradient
    (NaN * 0 = NaN). The fix decodes CIoU on unclamped boxes. Also checks
    the extreme-delta path (exp overflow guarded by CIOU_DELTA_CLIP)."""
    pred, gt = _random_batch(batch=1)
    pred = pred.copy()
    # anchor 0: shove the decoded box far off the top-left corner (large
    # negative dx/dy, tiny w/h) -> pre-fix clamp collapses it to (0,0,0,0)
    pred[0, 0, -4:] = [-60.0, -60.0, -6.0, -6.0]
    # anchor 1: absurd deltas that would overflow exp() without the clip
    pred[0, 1, -4:] = [200.0, -200.0, 120.0, 120.0]

    def f(p):
        r = resolve(p, jnp.asarray(ANCHORS), INPUT_SIZE, NUM_CLASSES,
                    with_log_probs=True)
        loss, _ = detection_loss(r, jnp.asarray(gt[:1]), NUM_ANCHORS,
                                 bbox_loss_kind="ciou",
                                 anchors_xywh=jnp.asarray(ANCHORS))
        return loss.mean()

    val, g = jax.value_and_grad(f)(jnp.asarray(pred))
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(g)))


def test_ciou_grad_finite_with_escaped_boxes_positive_anchor():
    """Same escape scenario but on a POSITIVE (mask=1) anchor: the CIoU
    term itself must stay finite and produce a restoring gradient."""
    pred, gt = _random_batch(batch=1)
    pred = pred.copy()
    pos = int(np.flatnonzero(gt[0, :, 0])[0])
    pred[0, pos, -4:] = [-60.0, -60.0, -6.0, -6.0]

    def f(p):
        r = resolve(p, jnp.asarray(ANCHORS), INPUT_SIZE, NUM_CLASSES,
                    with_log_probs=True)
        _, s = detection_loss(r, jnp.asarray(gt[:1]), NUM_ANCHORS,
                              bbox_loss_kind="ciou",
                              anchors_xywh=jnp.asarray(ANCHORS))
        return s["bbox_loss"].mean()

    val, g = jax.value_and_grad(f)(jnp.asarray(pred))
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(g)))
    # the escaped positive box still receives a pull-back gradient
    assert float(jnp.abs(g[0, pos, -4:]).sum()) > 0.0


def test_complete_iou_matches_torch_oracle():
    """CIoU parity vs an independently-written torch implementation
    (torchvision's complete_box_iou formula, transcribed) on random box
    pairs — same convention as every other numerical component here."""
    import math

    import torch

    from squeezedet_tpu.models.loss import complete_iou
    from squeezedet_tpu.ops.box_ops import compute_overlaps

    def ciou_torch(a, b):
        a = torch.as_tensor(a, dtype=torch.float64)
        b = torch.as_tensor(b, dtype=torch.float64)
        x1 = torch.maximum(a[:, 0], b[:, 0])
        y1 = torch.maximum(a[:, 1], b[:, 1])
        x2 = torch.minimum(a[:, 2], b[:, 2])
        y2 = torch.minimum(a[:, 3], b[:, 3])
        inter = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
        area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        iou = inter / (area_a + area_b - inter)
        cw = torch.maximum(a[:, 2], b[:, 2]) - torch.minimum(a[:, 0], b[:, 0])
        ch = torch.maximum(a[:, 3], b[:, 3]) - torch.minimum(a[:, 1], b[:, 1])
        c2 = cw**2 + ch**2
        rho2 = (
            ((a[:, 0] + a[:, 2]) - (b[:, 0] + b[:, 2])) ** 2
            + ((a[:, 1] + a[:, 3]) - (b[:, 1] + b[:, 3])) ** 2
        ) / 4.0
        wa, ha = a[:, 2] - a[:, 0], a[:, 3] - a[:, 1]
        wb, hb = b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]
        v = (4 / math.pi**2) * (
            torch.atan(wa / ha) - torch.atan(wb / hb)
        ) ** 2
        alpha = v / (1 - iou + v)
        return iou - rho2 / c2 - alpha * v

    rng = np.random.default_rng(7)
    xy = rng.uniform(0, 300, size=(64, 2, 2))
    wh = rng.uniform(5, 200, size=(64, 2, 2))
    a = np.concatenate([xy[:, 0], xy[:, 0] + wh[:, 0]], axis=1)
    b = np.concatenate([xy[:, 1], xy[:, 1] + wh[:, 1]], axis=1)

    ours = complete_iou(
        jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32),
        compute_overlaps(jnp.asarray(a, jnp.float32),
                         jnp.asarray(b, jnp.float32)),
    )[:, 0]
    want = ciou_torch(a, b).numpy()
    np.testing.assert_allclose(np.asarray(ours), want, rtol=2e-4, atol=2e-4)


# --- DIoU / GIoU bbox losses (--bbox_loss diou|giou) ----------------------

def _random_box_pairs(n=64, seed=7):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 300, size=(n, 2, 2))
    wh = rng.uniform(5, 200, size=(n, 2, 2))
    a = np.concatenate([xy[:, 0], xy[:, 0] + wh[:, 0]], axis=1)
    b = np.concatenate([xy[:, 1], xy[:, 1] + wh[:, 1]], axis=1)
    return a, b


def test_distance_iou_matches_torch_oracle():
    """DIoU parity vs a transcription of torchvision's distance_box_iou
    formula on random box pairs."""
    import torch

    from squeezedet_tpu.models.loss import distance_iou
    from squeezedet_tpu.ops.box_ops import compute_overlaps

    def diou_torch(a, b):
        a = torch.as_tensor(a, dtype=torch.float64)
        b = torch.as_tensor(b, dtype=torch.float64)
        x1 = torch.maximum(a[:, 0], b[:, 0])
        y1 = torch.maximum(a[:, 1], b[:, 1])
        x2 = torch.minimum(a[:, 2], b[:, 2])
        y2 = torch.minimum(a[:, 3], b[:, 3])
        inter = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
        area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        iou = inter / (area_a + area_b - inter)
        cw = torch.maximum(a[:, 2], b[:, 2]) - torch.minimum(a[:, 0], b[:, 0])
        ch = torch.maximum(a[:, 3], b[:, 3]) - torch.minimum(a[:, 1], b[:, 1])
        c2 = cw**2 + ch**2
        rho2 = (
            ((a[:, 0] + a[:, 2]) - (b[:, 0] + b[:, 2])) ** 2
            + ((a[:, 1] + a[:, 3]) - (b[:, 1] + b[:, 3])) ** 2
        ) / 4.0
        return iou - rho2 / c2

    a, b = _random_box_pairs()
    aj, bj = jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)
    ours = distance_iou(aj, bj, compute_overlaps(aj, bj))[:, 0]
    np.testing.assert_allclose(
        np.asarray(ours), diou_torch(a, b).numpy(), rtol=2e-4, atol=2e-4
    )


def test_generalized_iou_matches_torch_oracle():
    """GIoU parity vs a transcription of torchvision's generalized_box_iou
    formula on random box pairs."""
    import torch

    from squeezedet_tpu.models.loss import generalized_iou
    from squeezedet_tpu.ops.box_ops import compute_overlaps

    def giou_torch(a, b):
        a = torch.as_tensor(a, dtype=torch.float64)
        b = torch.as_tensor(b, dtype=torch.float64)
        x1 = torch.maximum(a[:, 0], b[:, 0])
        y1 = torch.maximum(a[:, 1], b[:, 1])
        x2 = torch.minimum(a[:, 2], b[:, 2])
        y2 = torch.minimum(a[:, 3], b[:, 3])
        inter = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
        area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        union = area_a + area_b - inter
        iou = inter / union
        cw = torch.maximum(a[:, 2], b[:, 2]) - torch.minimum(a[:, 0], b[:, 0])
        ch = torch.maximum(a[:, 3], b[:, 3]) - torch.minimum(a[:, 1], b[:, 1])
        c_area = cw * ch
        return iou - (c_area - union) / c_area

    a, b = _random_box_pairs()
    aj, bj = jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)
    ours = generalized_iou(aj, bj, compute_overlaps(aj, bj))[:, 0]
    np.testing.assert_allclose(
        np.asarray(ours), giou_torch(a, b).numpy(), rtol=2e-4, atol=2e-4
    )


def test_iou_family_ranges_and_identity():
    """GIoU/DIoU analytic sanity: 1 at identity; GIoU -> -1 as boxes
    separate far apart; DIoU in (-1, 1]; both penalize distance."""
    from squeezedet_tpu.models.loss import distance_iou, generalized_iou
    from squeezedet_tpu.ops.box_ops import compute_overlaps

    def val(fn, a, b):
        a = jnp.asarray([a], jnp.float32)
        b = jnp.asarray([b], jnp.float32)
        return float(fn(a, b, compute_overlaps(a, b))[0, 0])

    box = [10.0, 10.0, 30.0, 40.0]
    for fn in (distance_iou, generalized_iou):
        assert abs(val(fn, box, box) - 1.0) < 1e-6
        near = val(fn, box, [14.0, 10.0, 34.0, 40.0])
        far = val(fn, box, [80.0, 10.0, 100.0, 40.0])
        assert near > far
    # distant disjoint boxes: GIoU approaches -1, DIoU is bounded by -1
    g = val(generalized_iou, [0, 0, 1, 1], [999, 999, 1000, 1000])
    d = val(distance_iou, [0, 0, 1, 1], [999, 999, 1000, 1000])
    assert -1.0 <= g < -0.99
    assert -1.0 < d < 0.0


def _escaped_grad_check(kind):
    pred, gt = _random_batch(batch=1)
    pred = pred.copy()
    pos = int(np.flatnonzero(gt[0, :, 0])[0])
    # mask=0 escape + positive-anchor escape + exp-overflow deltas, the
    # same scenarios that NaN'd the clamped CIoU decode (EVIDENCE round 4)
    pred[0, 0, -4:] = [-60.0, -60.0, -6.0, -6.0]
    pred[0, 1, -4:] = [200.0, -200.0, 120.0, 120.0]
    pred[0, pos, -4:] = [-60.0, -60.0, -6.0, -6.0]

    def f(p):
        r = resolve(p, jnp.asarray(ANCHORS), INPUT_SIZE, NUM_CLASSES,
                    with_log_probs=True)
        _, s = detection_loss(r, jnp.asarray(gt[:1]), NUM_ANCHORS,
                              bbox_loss_kind=kind,
                              anchors_xywh=jnp.asarray(ANCHORS))
        return s["bbox_loss"].mean()

    val, g = jax.value_and_grad(f)(jnp.asarray(pred))
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(g)))
    # the escaped positive box still receives a pull-back gradient
    assert float(jnp.abs(g[0, pos, -4:]).sum()) > 0.0


def test_diou_grad_finite_with_escaped_boxes():
    _escaped_grad_check("diou")


def test_giou_grad_finite_with_escaped_boxes():
    _escaped_grad_check("giou")


def _perfect_prediction_zero_and_descends(kind):
    h, w = INPUT_SIZE
    rng = np.random.default_rng(0)
    gts = []
    for _ in range(2):
        idx = rng.choice(NUM_ANCHORS, 3, replace=False)
        boxes = xywh_to_xyxy(ANCHORS[idx] * rng.uniform(0.9, 1.1, size=(3, 4)))
        boxes = np.clip(boxes, [0, 0, 0, 0], [w - 1, h - 1, w - 1, h - 1])
        class_ids = rng.integers(0, NUM_CLASSES, 3)
        gts.append(encode_annotations(class_ids, boxes, ANCHORS, NUM_CLASSES))
    gt_j = jnp.asarray(np.stack(gts))
    pred, _ = _random_batch()
    perfect = jnp.asarray(pred).at[..., -4:].set(gt_j[..., 5:9])
    resolved_p = resolve(perfect, jnp.asarray(ANCHORS), INPUT_SIZE,
                         NUM_CLASSES, with_log_probs=True)
    _, stats_p = detection_loss(resolved_p, gt_j, NUM_ANCHORS,
                                bbox_loss_kind=kind,
                                anchors_xywh=jnp.asarray(ANCHORS))
    np.testing.assert_allclose(np.asarray(stats_p["bbox_loss"]), 0.0,
                               atol=1e-4)

    def bbox_term(p):
        r = resolve(p, jnp.asarray(ANCHORS), INPUT_SIZE, NUM_CLASSES,
                    with_log_probs=True)
        _, s = detection_loss(r, gt_j, NUM_ANCHORS, bbox_loss_kind=kind,
                              anchors_xywh=jnp.asarray(ANCHORS))
        return s["bbox_loss"].sum()

    g = jax.grad(bbox_term)(jnp.asarray(pred))
    assert np.all(np.isfinite(np.asarray(g)))
    stepped = jnp.asarray(pred) - 0.05 * g
    assert float(bbox_term(stepped)) < float(bbox_term(jnp.asarray(pred)))


def test_diou_bbox_loss_zero_at_perfect_and_descends():
    _perfect_prediction_zero_and_descends("diou")


def test_giou_bbox_loss_zero_at_perfect_and_descends():
    _perfect_prediction_zero_and_descends("giou")


# --- hybrid l2+<iou> bbox losses (--bbox_loss l2+ciou --bbox_iou_mix) ----

def test_hybrid_bbox_loss_is_l2_plus_mix_times_iou():
    """The hybrid element is EXACTLY l2_elem + mix * iou_elem, so the
    summed bbox stat decomposes the same way (same masks/normalizers)."""
    pred, gt = _random_batch()
    resolved = resolve(jnp.asarray(pred), jnp.asarray(ANCHORS), INPUT_SIZE,
                       NUM_CLASSES, with_log_probs=True)
    a = jnp.asarray(ANCHORS)
    gt_j = jnp.asarray(gt)
    _, s_l2 = detection_loss(resolved, gt_j, NUM_ANCHORS)
    for kind in ("ciou", "diou", "giou"):
        _, s_iou = detection_loss(resolved, gt_j, NUM_ANCHORS,
                                  bbox_loss_kind=kind, anchors_xywh=a)
        for mix in (0.0, 0.5, 2.0):
            _, s_h = detection_loss(resolved, gt_j, NUM_ANCHORS,
                                    bbox_loss_kind="l2+" + kind,
                                    anchors_xywh=a, iou_mix=mix)
            np.testing.assert_allclose(
                np.asarray(s_h["bbox_loss"]),
                np.asarray(s_l2["bbox_loss"])
                + mix * np.asarray(s_iou["bbox_loss"]),
                rtol=1e-5,
            )
    # mix=0 reproduces pure l2 BIT-for-bit on the total loss: the hybrid
    # short-circuits to the L2 branch (loss.py), so this is exact even
    # when the IoU element would be nonfinite — and anchors_xywh is not
    # required at mix 0
    l0, _ = detection_loss(resolved, gt_j, NUM_ANCHORS,
                           bbox_loss_kind="l2+ciou", iou_mix=0.0)
    l_l2, _ = detection_loss(resolved, gt_j, NUM_ANCHORS)
    assert np.array_equal(np.asarray(l0), np.asarray(l_l2))


def test_unknown_bbox_loss_kind_raises():
    """Programmatic callers bypassing the CLI's validation get the same
    fail-fast ValueError, not a bare trace-time AssertionError."""
    pred, gt = _random_batch()
    resolved = resolve(jnp.asarray(pred), jnp.asarray(ANCHORS), INPUT_SIZE,
                       NUM_CLASSES, with_log_probs=True)
    for bad in ("l2+foo", "foo", "iou2"):
        with pytest.raises(ValueError, match="unknown bbox_loss_kind"):
            detection_loss(resolved, jnp.asarray(gt), NUM_ANCHORS,
                           bbox_loss_kind=bad,
                           anchors_xywh=jnp.asarray(ANCHORS))


def test_hybrid_grad_finite_with_escaped_boxes():
    """The exp/ciou600 step-1 NaN scenario must stay fixed through the
    hybrid path (same unclamped decode + delta clip)."""
    pred, gt = _random_batch(batch=1)
    pred = pred.copy()
    pred[0, 0, -4:] = [-60.0, -60.0, -6.0, -6.0]
    pred[0, 1, -4:] = [200.0, -200.0, 120.0, 120.0]
    pos = int(np.flatnonzero(gt[0, :, 0])[0])
    pred[0, pos, -4:] = [-60.0, -60.0, -6.0, -6.0]

    def f(p):
        r = resolve(p, jnp.asarray(ANCHORS), INPUT_SIZE, NUM_CLASSES,
                    with_log_probs=True)
        loss, _ = detection_loss(r, jnp.asarray(gt[:1]), NUM_ANCHORS,
                                 bbox_loss_kind="l2+ciou",
                                 anchors_xywh=jnp.asarray(ANCHORS))
        return loss.mean()

    val, g = jax.value_and_grad(f)(jnp.asarray(pred))
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g[0, pos, -4:]).sum()) > 0.0


def test_hybrid_bbox_loss_zero_at_perfect_and_descends():
    _perfect_prediction_zero_and_descends("l2+ciou")


def test_hybrid_train_step_descends():
    """Full jitted train step with the hybrid loss descends and threads
    bbox_iou_mix through TaskSpec."""
    from squeezedet_tpu.models.squeezedet import ModelSpec, init_params
    from squeezedet_tpu.parallel.train import (
        TaskSpec, init_train_state, make_train_step,
    )

    task = TaskSpec(
        model=ModelSpec(arch="squeezedet", num_classes=3, anchors_per_grid=3,
                        dropout_prob=0.0),
        input_size=INPUT_SIZE,
        num_anchors=NUM_ANCHORS,
        bbox_loss_kind="l2+ciou",
        bbox_iou_mix=0.5,
    )
    params = init_params(jax.random.PRNGKey(0), task.model)
    state = init_train_state(params, task)
    step = make_train_step(task)
    _, gt = _random_batch(batch=2, seed=3)
    images = np.random.default_rng(4).normal(
        size=(2, *INPUT_SIZE, 3)
    ).astype(np.float32)
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(6):
        state, stats = step(
            state, jnp.asarray(images), jnp.asarray(gt),
            jnp.asarray(ANCHORS), 0.01, key,
        )
        losses.append(float(stats["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_validated_bbox_loss_accepts_hybrids_rejects_typos():
    from squeezedet_tpu.train import _validated_bbox_loss

    class C:
        pass

    for ok in ("l2", "ciou", "l2+ciou", "l2+diou", "l2+giou"):
        c = C(); c.bbox_loss = ok
        assert _validated_bbox_loss(c) == ok
    import pytest
    for bad in ("l2+foo", "cioux", "l2 + ciou"):
        c = C(); c.bbox_loss = bad
        with pytest.raises(SystemExit):
            _validated_bbox_loss(c)
