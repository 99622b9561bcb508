#!/usr/bin/env python
"""Full-resolution (384x1248) on-TPU pipeline parity vs the torch oracle.

The CPU test suite gates the same parity at half resolution
(tests/test_pipeline_parity.py); this tool runs the full KITTI-resolution
forward + on-device postprocess on the REAL backend (the axon TPU chip
when run in the session env) against the independent torch NCHW oracle on
the host, closing VERDICT.md round-1 weak-point #6 ("full-resolution
pipeline parity never asserted"). Results are recorded in EVIDENCE.md.

Usage: python tools/verify_fullres_parity.py [--ckpt exp/<id>/model_best]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SAMPLES = "/root/reference/data/samples/kitti/testing/image_2"
INPUT_SIZE = (384, 1248)
GRID = (24, 78)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="", help="trained params dir (orbax)")
    ap.add_argument("--image", default="", help="image path (default: first bundled sample)")
    args = ap.parse_args()

    import jax

    # fp32 parity needs true-fp32 convs; TPU defaults to bf16-pass matmuls
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from squeezedet_tpu.core.anchors import generate_anchors
    from squeezedet_tpu.core.image import resize, whiten
    from squeezedet_tpu.data.imageio import read_image
    from squeezedet_tpu.data.kitti import (
        KITTI_ANCHOR_SEEDS,
        KITTI_RGB_MEAN,
        KITTI_RGB_STD,
    )
    from squeezedet_tpu.models.squeezedet import ModelSpec, forward, init_params
    from squeezedet_tpu.ops.postprocess import postprocess

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from torch_oracle import forward_torch, greedy_nms_reference

    path = args.image or os.path.join(SAMPLES, sorted(os.listdir(SAMPLES))[0])
    image = read_image(path)
    image_meta = {"orig_size": np.array(image.shape, dtype=np.int32)}
    image, image_meta = whiten(image, image_meta, KITTI_RGB_MEAN, KITTI_RGB_STD)
    image, image_meta, _ = resize(image, image_meta, INPUT_SIZE)
    x = image[None].astype(np.float32)

    # He init for the random-weights mode: the reference's std-.005 init
    # leaves a random net nearly dead, which would make the parity check
    # numerically vacuous (all outputs ~1e-30)
    spec = ModelSpec(
        num_classes=3, anchors_per_grid=9, dropout_prob=0.0,
        init_scheme="he",
    )
    params = init_params(jax.random.PRNGKey(3), spec)
    score_thresh = 0.15  # random weights give mid scores
    if args.ckpt:
        from squeezedet_tpu.utils.checkpoint import load_params

        params, _ = load_params(args.ckpt, params)
        score_thresh = 0.3
    anchors = generate_anchors(GRID, INPUT_SIZE, KITTI_ANCHOR_SEEDS)

    print(f"backend: {jax.devices()[0].device_kind}; image: {path}")
    pred_jax = np.asarray(forward(params, jnp.asarray(x), spec))
    params_np = jax.tree.map(np.asarray, params)
    pred_torch = forward_torch(params_np, x, spec)
    fwd_max = np.abs(pred_jax - pred_torch).max()
    fwd_rel = np.abs(pred_jax - pred_torch).mean() / np.abs(pred_torch).mean()
    np.testing.assert_allclose(pred_jax, pred_torch, rtol=2e-3, atol=2e-3)
    print(f"forward parity OK: max|diff|={fwd_max:.2e} mean-rel={fwd_rel:.2e}")

    out = jax.device_get(postprocess(
        jnp.asarray(pred_torch), jnp.asarray(anchors),
        input_size=INPUT_SIZE, num_classes=3, top_k=64,
        nms_thresh=0.4, score_thresh=score_thresh,
    ))
    keep = out["keep"][0]
    boxes, scores, cls = out["boxes"][0], out["scores"][0], out["class_ids"][0]

    kept_ref: list[int] = []
    for c in range(3):
        sel = np.nonzero(cls == c)[0]
        if len(sel):
            k = greedy_nms_reference(boxes[sel], scores[sel], 0.4)
            kept_ref.extend(sel[k].tolist())
    want = np.zeros(64, dtype=bool)
    want[kept_ref] = True
    want &= scores > score_thresh
    np.testing.assert_array_equal(keep, want)
    assert keep.sum() > 0, "gate exercised no detections"
    print(
        f"postprocess parity OK: {int(keep.sum())} detections, keep-set "
        f"identical to the python NMS reference"
    )
    print("FULL-RES PARITY: PASS")


if __name__ == "__main__":
    main()
