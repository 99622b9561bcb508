"""Int8 PTQ serving path (models/quant.py): arithmetic correctness and
detection-level agreement with the float model."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from squeezedet_tpu.core.anchors import generate_anchors
from squeezedet_tpu.models.quant import (
    _quant_weight,
    calibrate_act_scales,
    forward_int8,
    quantize_params,
)
from squeezedet_tpu.models.squeezedet import ModelSpec, forward, init_params
from squeezedet_tpu.ops.postprocess import postprocess

SEEDS = np.array([[34, 30], [75, 45], [38, 90]], dtype=np.float32)
INPUT_SIZE = (96, 160)
ANCHORS = generate_anchors((6, 10), INPUT_SIZE, SEEDS)


def _setup(seed=0):
    # He init: the reference's std-.005 init leaves a random 12-layer net
    # nearly dead, whose ~0 activations quantize to all-zero int8
    spec = ModelSpec(
        num_classes=3, anchors_per_grid=3, dropout_prob=0.0,
        init_scheme="he",
    )
    params = init_params(jax.random.PRNGKey(seed), spec)
    rng = np.random.default_rng(seed)
    batches = [
        rng.normal(size=(2, *INPUT_SIZE, 3)).astype(np.float32)
        for _ in range(2)
    ]
    return spec, params, batches


def test_weight_quant_roundtrip():
    w = jnp.asarray(np.random.default_rng(0).normal(size=(3, 3, 8, 16)))
    q, scale = _quant_weight(w)
    assert q.dtype == jnp.int8
    err = np.abs(np.asarray(q) * np.asarray(scale) - np.asarray(w))
    # symmetric per-channel: error bounded by half a quantization step
    step = np.asarray(scale)
    assert np.all(err <= 0.5 * step + 1e-7)


def test_int8_forward_close_to_float():
    spec, params, batches = _setup()
    scales = calibrate_act_scales(params, spec, batches)
    qparams = quantize_params(params, spec, scales)

    x = jnp.asarray(batches[0])
    ref = np.asarray(forward(params, x, spec))
    out = np.asarray(forward_int8(qparams, x, spec))

    assert out.shape == ref.shape
    # int8 is lossy; require high global agreement, not elementwise match
    cos = np.sum(ref * out) / (np.linalg.norm(ref) * np.linalg.norm(out))
    assert cos > 0.99, cos
    rel = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert rel < 0.15, rel


def test_int8_detections_agree_with_float():
    """Detection-level gate: top-confidence boxes from the int8 path must
    overlap the float path's (IoU > 0.8, same class) on random scenes."""
    spec, params, batches = _setup(seed=3)
    scales = calibrate_act_scales(params, spec, batches)
    qparams = quantize_params(params, spec, scales)
    anchors = jnp.asarray(ANCHORS)

    x = jnp.asarray(batches[1])
    kw = dict(
        input_size=INPUT_SIZE, num_classes=3, top_k=16,
        nms_thresh=0.4, score_thresh=0.0,
    )
    det_f = jax.device_get(postprocess(forward(params, x, spec), anchors, **kw))
    det_q = jax.device_get(
        postprocess(forward_int8(qparams, x, spec), anchors, **kw)
    )

    def iou(a, b):
        lr = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
        tb = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
        inter = lr * tb
        ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1])
        return inter / (ua - inter + 1e-9)

    matched = total = 0
    for b in range(det_f["boxes"].shape[0]):
        kf = det_f["keep"][b]
        kq = det_q["keep"][b]
        for i in np.where(kf)[0][:5]:  # top-5 float detections
            total += 1
            for j in np.where(kq)[0]:
                if (
                    det_f["class_ids"][b][i] == det_q["class_ids"][b][j]
                    and iou(det_f["boxes"][b][i], det_q["boxes"][b][j]) > 0.8
                ):
                    matched += 1
                    break
    assert total > 0
    assert matched / total >= 0.8, (matched, total)


def test_detector_serve_int8(tmp_path, monkeypatch):
    """--serve_int8 detector end-to-end on the tiny on-disk dataset:
    lazy first-batch calibration, int8 predict, result txts."""
    from tests.test_e2e import TinyKITTI, _cfg, _make_kitti_tree
    from squeezedet_tpu.engine.detector import Detector
    from squeezedet_tpu.models.squeezedet import init_params
    from squeezedet_tpu.parallel.train import TaskSpec

    _make_kitti_tree(str(tmp_path / "data"))
    cfg = _cfg(tmp_path, serve_int8=True, mode="eval")
    dataset = TinyKITTI("val", cfg)
    cfg.update_dataset_info(dataset)

    task = TaskSpec(
        model=ModelSpec(
            num_classes=3, anchors_per_grid=9, dropout_prob=0.0,
            init_scheme="he",
        ),
        input_size=dataset.input_size,
        num_anchors=dataset.num_anchors,
        score_thresh=0.0,
    )
    params = init_params(jax.random.PRNGKey(0), task.model)
    det = Detector(params, task, cfg)
    results = det.detect_dataset(dataset)
    assert len(results) == len(dataset)
    assert det.qparams is not None  # calibration ran
    assert det.qparams["stem"]["w"].dtype == jnp.int8


def test_int8_rejects_uint8_batch(tmp_path):
    """A raw uint8 batch into the int8 path must fail loudly — calibrating
    absmax on 0-255 pixels would silently wreck every activation scale
    (serve.py mirrors detector.serve_uint8 so its requests never hit this)."""
    from tests.test_e2e import TinyKITTI, _cfg, _make_kitti_tree
    from squeezedet_tpu.engine.detector import Detector
    from squeezedet_tpu.models.squeezedet import init_params
    from squeezedet_tpu.parallel.train import TaskSpec

    _make_kitti_tree(str(tmp_path / "data"))
    cfg = _cfg(tmp_path, serve_int8=True, mode="eval")
    dataset = TinyKITTI("val", cfg)
    cfg.update_dataset_info(dataset)
    task = TaskSpec(
        model=ModelSpec(
            num_classes=3, anchors_per_grid=9, dropout_prob=0.0,
            init_scheme="he",
        ),
        input_size=dataset.input_size,
        num_anchors=dataset.num_anchors,
    )
    det = Detector(init_params(jax.random.PRNGKey(0), task.model), task, cfg)
    assert det.serve_uint8 is False  # int8 disabled uint8 ingest
    raw = jnp.zeros((cfg.batch_size, *dataset.input_size, 3), jnp.uint8)
    with pytest.raises(ValueError, match="whitened float"):
        det._run_predict(raw)
