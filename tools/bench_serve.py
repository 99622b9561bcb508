"""Load-test the serving daemon (main.py serve): RPS + latency percentiles.

Fires --requests POSTs to /detect from --clients concurrent threads and
prints ONE JSON line: achieved requests/s, per-request latency p50/p95/p99,
and the server's own /stats snapshot (mean batch occupancy, batch latency).

The payload is a real PNG (re-encoded synthetic KITTI frame by default, or
--image <path>), so the measurement includes the full serving path: HTTP,
host decode + resize, dynamic batching, the fixed-shape device dispatch,
and box un-mapping. On a single-core host the decode/resize step bounds
throughput well below the device ceiling (bench.py measures that ceiling);
this tool measures what a deployment actually gets end-to-end.

Usage:
    python main.py serve --load_model <ckpt> &           # on the TPU host
    python tools/bench_serve.py --url http://localhost:8080 \
        --clients 16 --requests 200
"""

from __future__ import annotations

import argparse
import json
import threading
import time
import urllib.request


def _default_png() -> bytes:
    import cv2
    import numpy as np

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (375, 1242, 3), dtype=np.uint8)
    img[150:260, 400:620] = (60, 60, 220)  # a "car"
    ok, buf = cv2.imencode(".png", img)
    assert ok
    return buf.tobytes()


def _get(url: str) -> dict:
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://localhost:8080")
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--requests", type=int, default=200)
    ap.add_argument("--image", default=None, help="PNG/JPEG to post")
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--raw", action="store_true",
                    help="post a pre-resized raw uint8 tensor "
                    "(decode-free serve.py fast path) instead of a PNG")
    args = ap.parse_args()

    health = _get(args.url + "/healthz")
    if args.raw:
        import numpy as np

        h, w = health["input_size"]
        rng = np.random.default_rng(0)
        frame = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        frame[150:260, 400:620] = (220, 60, 60)  # a "car"
        payload = frame.tobytes()
        content_type = "application/x-sqdt-raw-uint8"
    else:
        payload = (
            open(args.image, "rb").read() if args.image else _default_png()
        )
        content_type = "application/octet-stream"

    lat_ms: list[float] = []
    errors: list[str] = []
    lock = threading.Lock()
    it = iter(range(args.requests))

    def post_once() -> float:
        req = urllib.request.Request(
            args.url + "/detect", data=payload, method="POST",
            headers={"Content-Type": content_type},
        )
        t0 = time.time()
        with urllib.request.urlopen(req, timeout=120) as r:
            body = json.loads(r.read())
        if "error" in body:
            raise RuntimeError(body["error"])
        return 1000.0 * (time.time() - t0)

    def worker():
        while True:
            with lock:
                try:
                    next(it)
                except StopIteration:
                    return
            try:
                ms = post_once()
                with lock:
                    lat_ms.append(ms)
            except Exception as exc:  # count, don't abort the run
                with lock:
                    errors.append(f"{type(exc).__name__}: {exc}")

    for _ in range(args.warmup):  # compile + page everything in
        post_once()

    threads = [threading.Thread(target=worker) for _ in range(args.clients)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0

    lat = sorted(lat_ms)
    pct = lambda p: round(lat[int(p * (len(lat) - 1))], 1) if lat else None
    err_types: dict[str, int] = {}
    for e in errors:
        k = e.split(":", 1)[0]
        err_types[k] = err_types.get(k, 0) + 1
    print(json.dumps({
        "metric": "serve_rps",
        "value": round(len(lat) / wall, 1),
        "unit": "req/s",
        "clients": args.clients,
        "ingest": "raw_uint8" if args.raw else "png",
        "requests_ok": len(lat),
        "errors": len(errors),
        "error_types": err_types,
        "latency_ms_p50": pct(0.50),
        "latency_ms_p95": pct(0.95),
        "latency_ms_p99": pct(0.99),
        "server": {**health, **_get(args.url + "/stats")},
    }))
    for e in errors[:3]:
        print(f"[bench_serve] error: {e}")


if __name__ == "__main__":
    main()
