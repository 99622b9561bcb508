"""Serving daemon: HTTP detection endpoint with dynamic batching.

``python main.py serve --load_model <ckpt> [--port 8080 --max_wait_ms 15]``

No reference counterpart (the reference stops at ``detect_dataset``); this
is the deployment surface the TPU charter asks for. Design notes:

- **Fixed-shape dispatch.** The jitted predict step is compiled once for
  ``(batch_size, H, W, 3)``; every request batch is padded to that shape
  (``num_valid`` masks the tail), so no request pattern can trigger a
  recompile — the latency distribution stays flat.
- **Dynamic batching.** A single collector thread owns the device: it
  blocks on the request queue, then keeps gathering until the batch is
  full or ``--max_wait_ms`` has passed since the first request. Batch-1
  latency is one RTT + device time; concurrent clients coalesce toward
  full batches (the measured serving sweet spot, EVIDENCE.md).
- **uint8 ingest by default.** Requests ship raw decoded bytes to the
  device; whitening is folded into the stem conv (the measured-fastest
  path, engine/detector.py). ``--no_serve_uint8`` restores the float
  path bit-parity with the host pipeline.
- Preprocessing reuses the dataset recipe exactly (data/base.py
  inference_item): whiten (float path) + resize, or crop_or_pad under
  ``--forbid_resize``; boxes un-map through the same ``image_meta``
  protocol, so server responses match offline eval bit-for-bit.
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

import numpy as np


def decode_image_bytes(data: bytes) -> np.ndarray:
    """PNG/JPEG bytes -> RGB float32 HWC (the dataset load_image contract)."""
    try:
        import cv2

        arr = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        if arr is None:
            raise ValueError("cv2.imdecode returned None")
        return arr[..., ::-1].astype(np.float32)  # BGR -> RGB
    except ImportError:  # pragma: no cover
        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"), np.float32)


def preprocess_image(image: np.ndarray, cfg, raw: bool, image_id: str = "request"):
    """Single-image inference preprocessing (data/base.py inference_item):
    whiten (unless raw/uint8 ingest) then resize or crop_or_pad."""
    from squeezedet_tpu.core.image import crop_or_pad, resize, whiten

    image_meta: dict[str, Any] = {
        "image_id": image_id,
        "orig_size": np.array(image.shape, dtype=np.int32),
    }
    if not raw:
        image, image_meta = whiten(image, image_meta, cfg.rgb_mean, cfg.rgb_std)
    if getattr(cfg, "forbid_resize", False):
        image, image_meta, _ = crop_or_pad(image, image_meta, cfg.input_size)
    else:
        image, image_meta, _ = resize(image, image_meta, cfg.input_size)
    dtype = np.uint8 if raw else np.float32
    image = np.clip(image, 0, 255) if raw else image
    return np.ascontiguousarray(image, dtype=dtype), image_meta


def preprocess_image_native(data: bytes, cfg):
    """Compressed-ingest hot path: in-memory PNG/JPEG (sniffed from the
    magic bytes) -> native C++ decode +
    fused bilinear resize -> uint8 frame for the folded-whitening device
    dispatch. One ctypes call per request, entirely off the GIL, so the
    ThreadingHTTPServer handler threads overlap for real on the decode
    (the host bottleneck for PNG ingest — measured in EVIDENCE round 4).

    Only valid for the uint8-ingest server on the resize protocol; the
    caller falls back to the cv2 path (decode_image_bytes +
    preprocess_image) otherwise. Returns None when the native library is
    unavailable so the fallback stays automatic.
    """
    from squeezedet_tpu.data import native_loader

    if not native_loader.available():
        return None
    image, (oh, ow) = native_loader.decode_resize_u8(data, cfg.input_size)
    image_meta: dict[str, Any] = {
        "image_id": "request",
        "orig_size": np.array([oh, ow, 3], dtype=np.int32),
        "scales": np.array(
            [cfg.input_size[0] / oh, cfg.input_size[1] / ow], dtype=np.float32
        ),
    }
    return image, image_meta


RAW_TENSOR_CONTENT_TYPE = "application/x-sqdt-raw-uint8"


def preprocess_raw_tensor(data: bytes, cfg, raw: bool):
    """Decode-free ingest: the client ships a pre-resized uint8 HWC frame
    at exactly the network input size (Content-Type
    ``application/x-sqdt-raw-uint8``). Skips the per-request PNG decode +
    resize that bounds the single-core host (measured: the decode path
    caps the daemon at a fraction of the device ceiling); detections come
    back in input-frame coordinates. A sidecar (camera ISP, video
    decoder) owns the resize in this deployment pattern."""
    h, w = cfg.input_size
    expected = h * w * 3
    if len(data) != expected:
        raise ValueError(
            f"raw tensor payload must be exactly {expected} bytes "
            f"(uint8 {h}x{w}x3, the compiled input size), got {len(data)}"
        )
    image = np.frombuffer(data, np.uint8).reshape(h, w, 3)
    image_meta: dict[str, Any] = {
        "image_id": "request",
        "orig_size": np.array([h, w, 3], dtype=np.int32),
        "scales": np.array([1.0, 1.0], dtype=np.float32),
    }
    if raw:
        return np.ascontiguousarray(image), image_meta
    from squeezedet_tpu.core.image import whiten

    image, image_meta = whiten(
        image.astype(np.float32), image_meta, cfg.rgb_mean, cfg.rgb_std
    )
    return np.ascontiguousarray(image, np.float32), image_meta


def batch_buckets(batch_size: int) -> list[int]:
    """Padded-dispatch sizes: {1, B/8, B/4, B/2, B} (ceil, deduped).

    A partial batch is padded to the SMALLEST bucket that fits instead of
    always to ``batch_size``: each compiled shape is fixed (no traffic-
    dependent recompiles — every bucket is warmed before the server
    accepts connections), but the H2D payload shrinks with occupancy.
    Measured round 5: under the relay's degraded-H2D pathology (~6 MB/s)
    the daemon is wire-bound at ~1.44 MB/frame, and mean occupancy under
    closed-loop clients sits near B/4 — padding to B made every batch pay
    the full 28.7 MB regardless. On a healthy PCIe-attached TPU the
    buckets also cut tail latency for sparse traffic (a lone request
    dispatches 1 frame, not B)."""
    b = int(batch_size)
    raw = [1, -(-b // 8), -(-b // 4), -(-b // 2), b]
    return sorted(set(x for x in raw if 1 <= x <= b))


class DynamicBatcher:
    """Single-owner device loop: collect -> pad -> one fixed-shape dispatch.

    ``submit`` blocks the calling (HTTP handler) thread until its result is
    ready; the collector thread is the only one that touches the detector,
    so JAX dispatch stays single-threaded. Partial batches pad to the
    smallest warm bucket (``batch_buckets``), not to ``batch_size``.
    """

    def __init__(self, detector, cfg, max_wait_ms: float = 15.0):
        import queue

        self.detector = detector
        self.batch_size = int(cfg.batch_size)
        self.buckets = batch_buckets(self.batch_size)
        self.max_wait_s = float(max_wait_ms) / 1000.0
        self._queue: "queue.Queue" = queue.Queue()
        self._lock = threading.Lock()
        self.stats = {
            "requests": 0,
            "batches": 0,
            "batch_occupancy_sum": 0,
            "bucket_dispatches": {b: 0 for b in self.buckets},
            "latency_ms": [],  # bounded window, see _record
        }
        self._closed = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, image: np.ndarray, meta: dict,
               timeout_s: float = 600.0) -> dict:
        """Enqueue one preprocessed image; block until detection results.

        Bounded wait: a dead collector or a shutdown race must surface as
        an error to the HTTP handler, never as a permanently hung client
        connection (the default matches the dispatch watchdog bound)."""
        if self._closed:
            raise RuntimeError("server is shutting down")
        done = threading.Event()
        slot: dict[str, Any] = {}
        self._queue.put((image, meta, done, slot, time.time()))
        if not done.wait(timeout_s):
            raise TimeoutError(
                f"detection not completed within {timeout_s:.0f}s "
                "(collector stalled or dead — check /stats and server logs)"
            )
        if "error" in slot:
            raise slot["error"]
        return slot["result"]

    def close(self):
        self._closed = True
        self._queue.put(None)  # wake the collector
        self._thread.join(timeout=5)
        # fail any requests still queued behind the sentinel so their
        # handler threads wake instead of waiting out the full timeout
        while True:
            try:
                item = self._queue.get_nowait()
            except Exception:
                break
            if item is None:
                continue
            _, _, done, slot, _ = item
            slot["error"] = RuntimeError("server shut down before dispatch")
            done.set()

    def _collect(self):
        """Block for the first request, then gather until full or timeout."""
        first = self._queue.get()
        if first is None:
            return []
        items = [first]
        deadline = time.time() + self.max_wait_s
        while len(items) < self.batch_size:
            remaining = deadline - time.time()
            if remaining <= 0:
                break
            try:
                nxt = self._queue.get(timeout=remaining)
            except Exception:
                break
            if nxt is None:
                break
            items.append(nxt)
        return items

    def _record(self, n_items: int, t_submit_first: float):
        with self._lock:
            s = self.stats
            s["requests"] += n_items
            s["batches"] += 1
            s["batch_occupancy_sum"] += n_items
            s["latency_ms"].append(1000.0 * (time.time() - t_submit_first))
            if len(s["latency_ms"]) > 1000:
                s["latency_ms"] = s["latency_ms"][-1000:]

    def _loop(self):
        while not self._closed:
            items = self._collect()
            if not items:
                continue
            # the collector must never die with waiters attached: any
            # failure (stack, detect, result fan-out) is delivered to every
            # item and the loop continues serving
            try:
                images = [it[0] for it in items]
                metas = [it[1] for it in items]
                # pad to the smallest warm bucket; num_valid masks the tail
                bucket = next(
                    b for b in self.buckets if b >= len(images)
                )
                while len(images) < bucket:
                    images.append(images[-1])
                batch = {
                    "image": np.stack(images),
                    "image_metas": metas,
                    "num_valid": len(items),
                }
                results = self.detector.detect(batch)
                with self._lock:
                    self.stats["bucket_dispatches"][bucket] += 1
                for (_, _, done, slot, _), result in zip(items, results):
                    slot["result"] = result
                    done.set()
                self._record(len(items), items[0][4])
            except Exception as exc:  # deliver the failure to every waiter
                for _, _, done, slot, _ in items:
                    if not done.is_set():
                        slot["error"] = exc
                        done.set()

    def snapshot(self) -> dict:
        with self._lock:
            s = self.stats
            lat = sorted(s["latency_ms"])
            pct = lambda p: lat[int(p * (len(lat) - 1))] if lat else 0.0
            return {
                "requests": s["requests"],
                "batches": s["batches"],
                "mean_batch_occupancy": (
                    s["batch_occupancy_sum"] / s["batches"] if s["batches"] else 0.0
                ),
                "bucket_dispatches": {
                    str(k): v for k, v in s["bucket_dispatches"].items()
                },
                "batch_latency_ms_p50": round(pct(0.50), 2),
                "batch_latency_ms_p95": round(pct(0.95), 2),
            }


def result_to_json(result: dict, class_names) -> dict:
    """Detector._finalize output -> wire format (original-image coords)."""
    meta = result["image_meta"]
    dets = []
    if "boxes" in result:
        for cid, score, box in zip(
            result["class_ids"], result["scores"], result["boxes"]
        ):
            dets.append(
                {
                    "class_id": int(cid),
                    "class": str(class_names[int(cid)]),
                    "score": round(float(score), 4),
                    "box": [round(float(v), 2) for v in box],
                }
            )
    return {"image_id": str(meta["image_id"]), "detections": dets}


def make_handler(batcher: DynamicBatcher, cfg, started: float):
    """HTTP surface: POST /detect (image bytes), GET /healthz, GET /stats."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet access log; /stats has counters
            pass

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/healthz"):
                import jax

                self._json(
                    200,
                    {
                        "status": "ok",
                        "backend": jax.default_backend(),
                        "arch": cfg.arch,
                        "input_size": list(cfg.input_size),
                        "batch_size": cfg.batch_size,
                        "uptime_s": round(time.time() - started, 1),
                    },
                )
            elif self.path.startswith("/stats"):
                self._json(200, batcher.snapshot())
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if not self.path.startswith("/detect"):
                self._json(404, {"error": f"unknown path {self.path}"})
                return
            raw = bool(getattr(cfg, "serve_uint8", True))
            if raw and "raw=0" in self.path:
                # the ingest mode is a SERVER property: one compiled predict
                # program, one batch dtype. A per-request float image inside
                # a uint8 dynamic batch would be stacked to float32 and
                # skip whitening for its uint8 batchmates — silently wrong
                # detections. Bit-parity clients start the server with
                # --no_serve_uint8 instead.
                self._json(400, {
                    "error": "raw=0 requires a float-ingest server; "
                             "restart with --no_serve_uint8"
                })
                return
            # client-side failures (bad bytes, undecodable image) -> 400
            try:
                length = int(self.headers.get("Content-Length", 0))
                data = self.rfile.read(length)
                # media type only: strip any ';'-parameters and case per
                # RFC 2045 (proxies may append '; charset=...' or recase)
                ctype = (
                    self.headers.get("Content-Type", "")
                    .split(";", 1)[0].strip().lower()
                )
                if ctype == RAW_TENSOR_CONTENT_TYPE:
                    image, meta = preprocess_raw_tensor(data, cfg, raw=raw)
                else:
                    native = None
                    if raw and not getattr(cfg, "forbid_resize", False):
                        try:
                            native = preprocess_image_native(data, cfg)
                        except ValueError:
                            native = None  # unrecognized format -> cv2 fallback
                    if native is not None:
                        image, meta = native
                    else:
                        image = decode_image_bytes(data)
                        image, meta = preprocess_image(image, cfg, raw=raw)
            except Exception as exc:
                self._json(400, {"error": f"{type(exc).__name__}: {exc}"})
                return
            # server-side failures (dispatch, relay, shutdown) -> 500 so
            # load balancers treat the instance as unhealthy
            try:
                result = batcher.submit(image, meta)
                self._json(200, result_to_json(result, cfg.class_names))
            except Exception as exc:
                self._json(500, {"error": f"{type(exc).__name__}: {exc}"})

    return Handler


def build_server(detector, cfg, port: int | None = None, max_wait_ms=None):
    """Wire batcher + handler into a ThreadingHTTPServer (not yet serving)."""
    batcher = DynamicBatcher(
        detector,
        cfg,
        max_wait_ms=(
            max_wait_ms if max_wait_ms is not None
            else getattr(cfg, "max_wait_ms", 15.0)
        ),
    )
    handler = make_handler(batcher, cfg, started=time.time())
    httpd = ThreadingHTTPServer(
        ("0.0.0.0", int(port if port is not None else cfg.port)), handler
    )
    httpd.batcher = batcher  # for tests/shutdown
    return httpd


def warm_buckets(detector, cfg, retries: int = 5, retry_sleep_s: float = 30.0):
    """Compile + warm every dispatch bucket before accepting traffic.

    The axon relay can crash/restart its worker mid-warmup ("UNAVAILABLE:
    TPU worker process crashed or restarted" — a measured round-5 outage
    mode that killed ~30 daemon starts in one night, while the relay
    flapped faster than a full process restart could complete). The
    executable cache makes a retried warm cheap, so absorb transient
    execute failures here instead of dying and paying the full process
    startup (imports + checkpoint load) again. Non-UNAVAILABLE errors
    (a real bug in the serving program) still raise immediately.
    """
    for b in batch_buckets(cfg.batch_size):
        warm = np.zeros(
            (b, *cfg.input_size, 3),
            np.uint8 if getattr(cfg, "serve_uint8", True) else np.float32,
        )
        batch = {
            "image": warm,
            "image_metas": [
                {
                    "image_id": "warmup",
                    "orig_size": np.array([*cfg.input_size, 3], np.int32),
                    "scales": np.array([1.0, 1.0], np.float32),
                }
            ],
            "num_valid": 1,
        }
        for attempt in range(retries):
            try:
                detector.detect(batch)
                break
            except Exception as exc:  # jax runtime errors aren't one type
                if attempt == retries - 1 or "UNAVAILABLE" not in str(exc):
                    raise
                print(
                    f"[serve] warmup b{b} hit transient backend failure "
                    f"(attempt {attempt + 1}/{retries}, retrying in "
                    f"{retry_sleep_s:.0f}s): "
                    f"{str(exc).splitlines()[0][:120]}"
                )
                time.sleep(retry_sleep_s)


def serve(cfg) -> None:
    """CLI entry: load the model, compile the serving path, serve forever."""
    import jax

    from squeezedet_tpu.data.kitti import (
        KITTI_ANCHOR_SEEDS,
        KITTI_CLASS_NAMES,
        KITTI_INPUT_SIZE,
        KITTI_RGB_MEAN,
        KITTI_RGB_STD,
    )
    from squeezedet_tpu.core.anchors import generate_anchors
    from squeezedet_tpu.engine.detector import Detector
    from squeezedet_tpu.models.squeezedet import init_params
    from squeezedet_tpu.utils.checkpoint import load_any

    if getattr(cfg, "dataset", "kitti") != "kitti":
        raise SystemExit(
            f"serve: --dataset {cfg.dataset} is not servable — the daemon "
            "bakes in the KITTI geometry (input size, classes, anchors) so "
            "it can start without the dataset on disk; score COCO "
            "checkpoints with `main.py eval --dataset coco` instead"
        )
    # dataset constants without requiring the dataset on disk (demo.py)
    cfg.input_size = KITTI_INPUT_SIZE
    cfg.rgb_mean, cfg.rgb_std = KITTI_RGB_MEAN, KITTI_RGB_STD
    cfg.class_names = KITTI_CLASS_NAMES
    cfg.num_classes = len(KITTI_CLASS_NAMES)
    grid = tuple(x // 16 for x in KITTI_INPUT_SIZE)
    cfg.anchors = generate_anchors(grid, KITTI_INPUT_SIZE, KITTI_ANCHOR_SEEDS)
    cfg.anchors_per_grid = KITTI_ANCHOR_SEEDS.shape[0]
    cfg.num_anchors = cfg.anchors.shape[0]

    from squeezedet_tpu.train import build_task

    task = build_task(cfg)
    params = init_params(jax.random.PRNGKey(cfg.seed), task.model)
    if cfg.load_model:
        params, _ = load_any(cfg.load_model, params, task.model)
    elif not cfg.allow_random_weights:
        raise SystemExit(
            "serve: refusing to serve random weights; pass --load_model "
            "<ckpt> (or --allow_random_weights to smoke-test)"
        )

    # Detector construction stages the weights into HBM (device_put) —
    # under the relay's worker-crash pathology that transfer can die too,
    # so the whole build-and-warm block shares the transient-retry policy
    # (a retried construction is cheap: no recompile, just the put).
    buckets = batch_buckets(cfg.batch_size)
    t0 = time.time()
    for attempt in range(5):
        try:
            detector = Detector(params, task, cfg)
            # the Detector may disable uint8 ingest (e.g. --serve_int8
            # quantizes whitened float inputs); mirror its decision so the
            # warm-up batch and the request handler ship the dtype the
            # active path expects
            cfg.serve_uint8 = detector.serve_uint8
            # compile + warm EVERY dispatch bucket before accepting
            # traffic, so no request pattern can hit a cold compile
            # mid-traffic (the compile cache makes restarts cheap)
            warm_buckets(detector, cfg)
            break
        except Exception as exc:
            if attempt == 4 or "UNAVAILABLE" not in str(exc):
                raise
            print(
                f"[serve] detector build/warm hit transient backend "
                f"failure (attempt {attempt + 1}/5, retrying in 30s): "
                f"{str(exc).splitlines()[0][:120]}"
            )
            time.sleep(30)
    print(
        f"[serve] compiled serving path in {time.time() - t0:.1f}s "
        f"(buckets {buckets})"
    )

    httpd = build_server(detector, cfg)
    from squeezedet_tpu.data import native_loader

    png_decoder = (
        "native C++"
        if (
            cfg.serve_uint8
            and not getattr(cfg, "forbid_resize", False)
            and native_loader.available()
        )
        else "cv2"
    )
    print(
        f"[serve] listening on :{cfg.port} "
        f"(batch {cfg.batch_size}, buckets {buckets}, "
        f"max_wait {cfg.max_wait_ms}ms, "
        f"{'uint8' if cfg.serve_uint8 else 'float32'} ingest, "
        f"PNG decode: {png_decoder})"
    )
    try:
        httpd.serve_forever()
    finally:
        httpd.batcher.close()
