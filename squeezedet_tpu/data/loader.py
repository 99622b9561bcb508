"""Host-side batched loading with threaded workers and device prefetch.

Replaces the reference's torch DataLoader worker *processes*
(src/train.py:40-50) with a thread pool: the heavy per-sample work (PNG
decode in cv2/native code, cv2 resize) releases the GIL, and threads avoid
fork/pickle overhead. Batches are numpy (NHWC); `prefetch_to_device` overlaps
host->HBM transfer with device compute — the TPU analog of
pin_memory+non_blocking H2D (reference src/engine/trainer.py:36-38).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterator

import numpy as np


def _collate(samples: list[dict[str, Any]]) -> dict[str, Any]:
    batch: dict[str, Any] = {
        "image": np.stack([s["image"] for s in samples]),
        "image_metas": [s["image_meta"] for s in samples],
    }
    if "gt" in samples[0]:
        batch["gt"] = np.stack([s["gt"] for s in samples])
    return batch


class DataLoader:
    """Ordered, threaded batch loader.

    :param dataset: BaseDataset instance.
    :param inference: use the annotation-free `inference_item` path.
    :param pad_last: pad the final partial batch to full size by repeating
        the last sample (static batch shapes for XLA); padded count is
        reported in the batch as 'num_valid'.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 4,
        inference: bool = False,
        pad_last: bool = False,
        seed: int | None = None,
        raw_uint8: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.inference = inference
        self.pad_last = pad_last
        self.raw_uint8 = raw_uint8
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[dict[str, Any]]:
        if self.inference:
            if self.raw_uint8:
                fetch = lambda i: self.dataset.inference_item(i, raw=True)  # noqa: E731
            else:
                fetch = self.dataset.inference_item
        else:
            fetch = self.dataset.__getitem__
        indices = self._indices()
        n_batches = len(self)

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            # window of in-flight futures, consumed in order
            futures = {}
            window = self.num_workers * 2 + self.batch_size
            submit_at = 0

            def top_up(limit):
                nonlocal submit_at
                while submit_at < limit and len(futures) < window:
                    futures[submit_at] = pool.submit(fetch, int(indices[submit_at]))
                    submit_at += 1

            total = n_batches * self.batch_size if self.drop_last else len(indices)
            for b in range(n_batches):
                start = b * self.batch_size
                stop = min(start + self.batch_size, total)
                top_up(min(total, stop + window))
                samples = [futures.pop(i).result() for i in range(start, stop)]
                num_valid = len(samples)
                if self.pad_last and num_valid < self.batch_size:
                    samples += [samples[-1]] * (self.batch_size - num_valid)
                batch = _collate(samples)
                batch["num_valid"] = num_valid
                yield batch


def prefetch_to_device(
    iterator: Iterator[dict[str, Any]],
    size: int = 2,
    to_device: Callable[[dict[str, Any]], dict[str, Any]] | None = None,
) -> Iterator[dict[str, Any]]:
    """Run `to_device` (e.g. a sharded jax.device_put of the array fields) a
    few batches ahead on a background thread, hiding host->HBM latency."""
    if to_device is None or size <= 0:
        yield from iterator
        return

    q: queue.Queue = queue.Queue(maxsize=size)
    stop = threading.Event()
    _END = object()

    def _put(item) -> bool:
        """Blocking put that aborts when the consumer has gone away, so an
        early exit (e.g. --num_iters truncating an epoch) can't leave this
        thread parked forever on a full queue pinning sharded device
        batches in HBM."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for batch in iterator:
                if stop.is_set() or not _put(to_device(batch)):
                    return
        except BaseException as e:  # propagate loader errors to consumer
            _put(e)
            return
        _put(_END)

    thread = threading.Thread(
        target=producer, daemon=True, name="sqdt-prefetch"
    )
    thread.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        # runs on normal exhaustion, consumer break (generator .close() /
        # GC), or an exception in the consumer
        stop.set()
