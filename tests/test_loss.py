import jax
import jax.numpy as jnp
import numpy as np

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
