"""Serving daemon (squeezedet_tpu/serve.py): dynamic batcher semantics,
preprocessing/wire format, and a live HTTP round-trip through the real
Detector on the CPU backend."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from squeezedet_tpu.config import Config
from squeezedet_tpu.serve import (
    DynamicBatcher,
    build_server,
    decode_image_bytes,
    preprocess_image,
    result_to_json,
)

from tests.test_e2e import TinyKITTI, _make_kitti_tree


class FakeDetector:
    """Records dispatched batches; returns an identifiable result per image."""

    def __init__(self, delay_s=0.0):
        self.batches = []
        self.delay_s = delay_s

    def detect(self, batch):
        self.batches.append(batch)
        time.sleep(self.delay_s)
        return [
            {
                "image_meta": batch["image_metas"][b],
                "class_ids": np.array([0]),
                "scores": np.array([0.9]),
                "boxes": np.array([[1.0, 2.0, 3.0, 4.0]]),
            }
            for b in range(batch["num_valid"])
        ]


class _Cfg:
    batch_size = 4


def test_batcher_pads_to_fixed_shape_and_routes_results():
    det = FakeDetector()
    b = DynamicBatcher(det, _Cfg(), max_wait_ms=5)
    img = np.zeros((8, 8, 3), np.uint8)
    out = b.submit(img, {"image_id": "a"})
    assert out["image_meta"]["image_id"] == "a"
    batch = det.batches[0]
    # a lone request pads to the SMALLEST bucket, not to batch_size —
    # fewer H2D bytes per dispatch (bucketed dispatch, round 5)
    assert batch["image"].shape == (1, 8, 8, 3)
    assert batch["num_valid"] == 1
    b.close()


def test_batcher_bucketed_dispatch():
    """Partial batches pad to the smallest warm bucket ≥ occupancy; every
    dispatched shape is one of batch_buckets(batch_size)."""
    from squeezedet_tpu.serve import batch_buckets

    assert batch_buckets(20) == [1, 3, 5, 10, 20]
    assert batch_buckets(4) == [1, 2, 4]
    assert batch_buckets(1) == [1]

    class Cfg20:
        batch_size = 20

    det = FakeDetector(delay_s=0.05)
    b = DynamicBatcher(det, Cfg20(), max_wait_ms=250)
    img = np.zeros((8, 8, 3), np.uint8)
    results = {}

    def post(name):
        results[name] = b.submit(img, {"image_id": name})

    threads = [threading.Thread(target=post, args=(f"r{i}",)) for i in range(4)]
    for t in threads:
        t.start()
        time.sleep(0.01)
    for t in threads:
        t.join()
    assert len(results) == 4
    for batch in det.batches:
        assert batch["image"].shape[0] in (1, 3, 5, 10, 20)
        assert batch["image"].shape[0] >= batch["num_valid"]
    # 4 concurrent requests coalesce into a 5-bucket (or smaller) dispatch,
    # never the full 20
    assert all(batch["image"].shape[0] <= 5 for batch in det.batches)
    snap = b.snapshot()
    assert sum(snap["bucket_dispatches"].values()) == len(det.batches)
    b.close()


def test_batcher_coalesces_concurrent_requests():
    det = FakeDetector(delay_s=0.05)
    b = DynamicBatcher(det, _Cfg(), max_wait_ms=250)
    img = np.zeros((8, 8, 3), np.uint8)
    results = {}

    def post(name):
        results[name] = b.submit(img, {"image_id": name})

    threads = [threading.Thread(target=post, args=(f"r{i}",)) for i in range(4)]
    for t in threads:
        t.start()
        time.sleep(0.01)  # arrive within one max_wait window
    for t in threads:
        t.join()
    assert {r["image_meta"]["image_id"] for r in results.values()} == {
        "r0", "r1", "r2", "r3",
    }
    # each result went back to its own submitter
    for name, r in results.items():
        assert r["image_meta"]["image_id"] == name
    assert len(det.batches) <= 2  # coalesced, not one dispatch per request
    snap = b.snapshot()
    assert snap["requests"] == 4
    assert snap["mean_batch_occupancy"] >= 2.0
    b.close()


def test_batcher_delivers_errors_to_waiters():
    class Boom:
        def detect(self, batch):
            raise RuntimeError("kaput")

    b = DynamicBatcher(Boom(), _Cfg(), max_wait_ms=1)
    with pytest.raises(RuntimeError, match="kaput"):
        b.submit(np.zeros((4, 4, 3), np.uint8), {"image_id": "x"})
    b.close()


def _serve_cfg(tmp_path):
    cfg = Config(
        mode="serve", batch_size=2, keep_top_k=16, score_thresh=0.1,
        max_wait_ms=200.0,
    )
    cfg.finalize_dirs(root_dir=str(tmp_path))
    cfg.data_dir = str(tmp_path / "data")
    return cfg


def test_preprocess_paths_and_wire_format(tmp_path):
    _make_kitti_tree(str(tmp_path / "data"))
    cfg = _serve_cfg(tmp_path)
    ds = TinyKITTI("val", cfg)
    cfg.update_dataset_info(ds)

    img = np.random.default_rng(0).integers(0, 255, (200, 600, 3)).astype(
        np.float32
    )
    raw, meta = preprocess_image(img.copy(), cfg, raw=True)
    assert raw.dtype == np.uint8 and raw.shape == (*cfg.input_size, 3)
    assert "rgb_mean" not in meta and "scales" in meta

    flt, meta_f = preprocess_image(img.copy(), cfg, raw=False)
    assert flt.dtype == np.float32 and "rgb_mean" in meta_f

    # raw-tensor ingest: uint8 passthrough / float whitening, strict size
    from squeezedet_tpu.serve import preprocess_raw_tensor

    h, w = cfg.input_size
    frame = np.random.default_rng(1).integers(0, 255, (h, w, 3), np.uint8)
    rt, meta_rt = preprocess_raw_tensor(frame.tobytes(), cfg, raw=True)
    assert rt.dtype == np.uint8
    np.testing.assert_array_equal(rt, frame)
    assert list(meta_rt["orig_size"][:2]) == [h, w]
    ft, _ = preprocess_raw_tensor(frame.tobytes(), cfg, raw=False)
    np.testing.assert_allclose(
        ft, (frame.astype(np.float32) - cfg.rgb_mean) / cfg.rgb_std,
        rtol=1e-6,
    )
    with pytest.raises(ValueError, match="bytes"):
        preprocess_raw_tensor(frame.tobytes()[:-1], cfg, raw=True)

    payload = result_to_json(
        {
            "image_meta": {"image_id": "req1"},
            "class_ids": np.array([1]),
            "scores": np.array([0.87]),
            "boxes": np.array([[10.0, 20.0, 30.0, 40.0]]),
        },
        cfg.class_names,
    )
    assert payload["image_id"] == "req1"
    det = payload["detections"][0]
    assert det["class"] == cfg.class_names[1]
    assert det["score"] == pytest.approx(0.87)
    assert det["box"] == [10.0, 20.0, 30.0, 40.0]
    # empty result (no "boxes" key) must serialize to an empty list
    assert result_to_json({"image_meta": {"image_id": "e"}}, cfg.class_names)[
        "detections"
    ] == []


def test_http_round_trip_real_detector(tmp_path):
    """Full stack: HTTP POST (PNG bytes) -> batcher -> jitted Detector on
    the CPU backend -> JSON detections in original coordinates."""
    import cv2
    import jax

    from squeezedet_tpu.engine.detector import Detector
    from squeezedet_tpu.models.squeezedet import init_params
    from squeezedet_tpu.train import build_task

    _make_kitti_tree(str(tmp_path / "data"))
    cfg = _serve_cfg(tmp_path)
    ds = TinyKITTI("val", cfg)
    cfg.update_dataset_info(ds)
    task = build_task(cfg)
    # scaled-up random weights so some scores clear the threshold
    params = jax.tree.map(
        lambda a: a * 30.0, init_params(jax.random.PRNGKey(0), task.model)
    )
    detector = Detector(params, task, cfg)

    httpd = build_server(detector, cfg, port=0)  # OS-assigned free port
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        img = np.random.default_rng(1).integers(
            0, 255, (200, 600, 3), dtype=np.uint8
        )
        img[60:140, 200:340] = (250, 60, 60)
        ok, png = cv2.imencode(".png", img[..., ::-1])
        assert ok

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/detect", data=png.tobytes(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            assert resp.status == 200
            payload = json.loads(resp.read())
        assert set(payload) == {"image_id", "detections"}
        for d in payload["detections"]:
            assert set(d) == {"class_id", "class", "score", "box"}
            assert d["class"] in cfg.class_names
            x1, y1, x2, y2 = d["box"]
            # original-image coordinates, not network-input coordinates
            assert 0 <= x1 <= x2 <= 600 and 0 <= y1 <= y2 <= 200

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as resp:
            health = json.loads(resp.read())
        assert health["status"] == "ok"
        assert health["input_size"] == list(cfg.input_size)

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=30
        ) as resp:
            stats = json.loads(resp.read())
        assert stats["requests"] == 1 and stats["batches"] == 1

        # malformed body -> structured 400, server stays up
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/detect", data=b"not an image",
            method="POST",
        )
        try:
            urllib.request.urlopen(bad, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "error" in json.loads(e.read())

        # raw-tensor ingest: pre-resized uint8 frame, decode-free path;
        # detections come back in input-frame coordinates
        h, w = cfg.input_size
        frame = np.zeros((h, w, 3), dtype=np.uint8)
        frame[h // 4: 3 * h // 4, w // 4: 3 * w // 4] = (250, 60, 60)
        raw_req = urllib.request.Request(
            f"http://127.0.0.1:{port}/detect", data=frame.tobytes(),
            method="POST",
            headers={"Content-Type": "application/x-sqdt-raw-uint8"},
        )
        with urllib.request.urlopen(raw_req, timeout=120) as resp:
            assert resp.status == 200
            raw_payload = json.loads(resp.read())
        for d in raw_payload["detections"]:
            x1, y1, x2, y2 = d["box"]
            assert 0 <= x1 <= x2 <= w and 0 <= y1 <= y2 <= h

        # wrong-size raw tensor -> structured 400
        bad_raw = urllib.request.Request(
            f"http://127.0.0.1:{port}/detect", data=frame.tobytes()[:-7],
            method="POST",
            headers={"Content-Type": "application/x-sqdt-raw-uint8"},
        )
        try:
            urllib.request.urlopen(bad_raw, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "bytes" in json.loads(e.read())["error"]
    finally:
        httpd.shutdown()
        httpd.batcher.close()


def test_png_native_ingest_matches_cv2_path(tmp_path):
    """The native compressed-ingest path (preprocess_image_native) must agree
    with the cv2 fallback (decode -> float resize -> clip -> uint8) within
    1 LSB, carry an identical meta contract, and fall back cleanly on
    non-PNG bytes."""
    import cv2

    from squeezedet_tpu.data import native_loader
    from squeezedet_tpu.serve import preprocess_image_native

    if not native_loader.available():
        pytest.skip("native loader not built")

    _make_kitti_tree(str(tmp_path / "data"))
    cfg = _serve_cfg(tmp_path)
    ds = TinyKITTI("val", cfg)
    cfg.update_dataset_info(ds)

    img = np.random.default_rng(3).integers(
        0, 255, (200, 600, 3), dtype=np.uint8
    )
    ok, png = cv2.imencode(".png", img[..., ::-1])
    assert ok
    data = png.tobytes()

    native = preprocess_image_native(data, cfg)
    assert native is not None
    got, meta = native
    assert got.dtype == np.uint8 and got.shape == (*cfg.input_size, 3)

    want, meta_cv = preprocess_image(
        decode_image_bytes(data), cfg, raw=True
    )
    diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
    assert diff.max() <= 1
    # meta parity: same orig_size and scales as the cv2 chain computes
    np.testing.assert_array_equal(
        meta["orig_size"], np.asarray(meta_cv["orig_size"])
    )
    np.testing.assert_allclose(meta["scales"], meta_cv["scales"], rtol=1e-6)

    # JPEG goes through the native path too (libjpeg), within a few LSB
    # of the cv2 decode of the same bytes
    ok, jpg = cv2.imencode(
        ".jpg", img[..., ::-1], [int(cv2.IMWRITE_JPEG_QUALITY), 95]
    )
    assert ok
    got_j, _ = preprocess_image_native(jpg.tobytes(), cfg)
    want_j, _ = preprocess_image(
        decode_image_bytes(jpg.tobytes()), cfg, raw=True
    )
    dj = np.abs(got_j.astype(np.int16) - want_j.astype(np.int16))
    assert dj.max() <= 4 and (dj > 1).mean() < 0.01

    # unrecognized bytes must raise ValueError (the handler then uses cv2)
    with pytest.raises(ValueError):
        preprocess_image_native(b"BM not really a bitmap", cfg)


def test_warm_buckets_retries_transient_unavailable():
    """Warmup absorbs transient UNAVAILABLE backend failures (the relay
    worker-crash outage mode) but raises real errors immediately."""
    from squeezedet_tpu.serve import warm_buckets

    class Cfg:
        batch_size = 4
        input_size = (8, 16)
        serve_uint8 = True

    class FlakyDetector:
        def __init__(self, fail_first_n):
            self.calls = 0
            self.fail_first_n = fail_first_n

        def detect(self, batch):
            self.calls += 1
            if self.calls <= self.fail_first_n:
                raise RuntimeError(
                    "UNAVAILABLE: TPU worker process crashed or restarted."
                )
            return [{}]

    det = FlakyDetector(fail_first_n=2)
    warm_buckets(det, Cfg(), retries=3, retry_sleep_s=0.0)
    # buckets {1,2,4}: 2 failures + 1 success on b1, then b2, b4
    assert det.calls == 5

    class BuggyDetector:
        def detect(self, batch):
            raise ValueError("shape mismatch — a real bug, not the relay")

    with pytest.raises(ValueError, match="real bug"):
        warm_buckets(BuggyDetector(), Cfg(), retries=3, retry_sleep_s=0.0)

    # retry budget exhausted -> the UNAVAILABLE surfaces
    det2 = FlakyDetector(fail_first_n=99)
    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        warm_buckets(det2, Cfg(), retries=2, retry_sleep_s=0.0)
