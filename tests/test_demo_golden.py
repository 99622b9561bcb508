"""Golden-detections regression gate on the 10 bundled KITTI samples.

The reference's de-facto end-to-end regression check is `python main.py
demo` over the bundled test images with a pinned checkpoint
(src/demo.py:17-52, README.md:72-87). This makes it explicit: run the
demo driver with a committed checkpoint on the 10 samples at
/root/reference/data/samples/kitti/testing/image_2, and assert the
boxes/scores/classes reproduce the committed golden JSON. Any refactor of
preprocessing, the forward pass, decode, NMS, thresholding or coordinate
un-mapping that shifts a detection trips this gate.

Two checkpoints are gated: the original scratch baseline
(`exp/hard300/model_best`, squeezedet) and the advertised flagship
(`exp/hyb_ft150/model_best`, squeezedetplus) — the flagship is what
README headlines, so predict-path refactors must not silently move it.

Golden provenance: generated on the 8-virtual-CPU-device test backend
(tests/conftest.py) — the same backend CI asserts on, so reproduction is
deterministic. Regenerate after an INTENDED behavior change with:

    SQDT_UPDATE_GOLDEN=1 python -m pytest tests/test_demo_golden.py -q
"""

import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SAMPLES = "/root/reference/data/samples/kitti/testing/image_2"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

GATES = {
    "hard300": {
        "ckpt": os.path.join(REPO, "exp", "hard300", "model_best"),
        "arch": "squeezedet",
        "golden": os.path.join(GOLDEN_DIR, "demo_detections.json"),
    },
    "hyb_ft150": {
        "ckpt": os.path.join(REPO, "exp", "hyb_ft150", "model_best"),
        "arch": "squeezedetplus",
        "golden": os.path.join(GOLDEN_DIR, "demo_detections_hyb_ft150.json"),
    },
}


def _run_demo(tmp_path, ckpt, arch):
    from squeezedet_tpu.config import parse
    from squeezedet_tpu.demo import _sample_paths, demo

    cfg = parse(["demo", "--load_model", ckpt, "--arch", arch,
                 "--exp_id", "golden_demo", "--debug", "1"])
    #   debug=1 is inert in demo: no dataset __getitem__ runs, and the
    #   Detector only renders at debug==2 — keeps the gate from writing
    #   PNGs into the repo
    cfg.debug_dir = str(tmp_path)
    results = demo(cfg)
    paths = _sample_paths(cfg)
    assert len(results) == len(paths)
    out = {}
    for path, res in zip(paths, results):
        image_id = os.path.basename(path)[:-4]
        order = np.lexsort(
            (np.asarray(res["class_ids"]), -np.asarray(res["scores"]))
        )
        out[image_id] = {
            "class_ids": np.asarray(res["class_ids"])[order].tolist(),
            "scores": [round(float(s), 5)
                       for s in np.asarray(res["scores"])[order]],
            "boxes": [[round(float(v), 2) for v in b]
                      for b in np.asarray(res["boxes"])[order]],
        }
    return out


@pytest.mark.skipif(not os.path.isdir(SAMPLES),
                    reason="bundled reference samples not mounted")
@pytest.mark.parametrize("name", sorted(GATES))
def test_demo_golden_detections(tmp_path, name):
    gate = GATES[name]
    if not os.path.isdir(gate["ckpt"]):
        pytest.skip(f"committed {name} checkpoint missing")
    got = _run_demo(tmp_path, gate["ckpt"], gate["arch"])

    if os.environ.get("SQDT_UPDATE_GOLDEN"):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(gate["golden"], "w") as fp:
            json.dump(got, fp, indent=1, sort_keys=True)
        pytest.skip(f"golden regenerated at {gate['golden']}")

    assert os.path.isfile(gate["golden"]), (
        "golden file missing — generate with SQDT_UPDATE_GOLDEN=1"
    )
    with open(gate["golden"]) as fp:
        want = json.load(fp)

    assert sorted(got) == sorted(want), (sorted(got), sorted(want))
    for image_id in sorted(want):
        g, w = got[image_id], want[image_id]
        assert g["class_ids"] == w["class_ids"], image_id
        # same backend + fixed weights: drift here means a semantic change
        # somewhere in preprocess/forward/decode/NMS/un-mapping
        np.testing.assert_allclose(
            g["scores"], w["scores"], atol=5e-4, rtol=1e-4,
            err_msg=image_id,
        )
        if w["boxes"]:
            np.testing.assert_allclose(
                g["boxes"], w["boxes"], atol=0.05, rtol=1e-4,
                err_msg=image_id,
            )
