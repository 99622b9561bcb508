import numpy as np
import pytest

from squeezedet_tpu.data.loader import DataLoader, prefetch_to_device


class ToyDataset:
    def __init__(self, n=10, with_gt=True):
        self.n = n
        self.with_gt = with_gt

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        out = {
            "image": np.full((4, 6, 3), i, dtype=np.float32),
            "image_meta": {"index": i, "image_id": str(i)},
        }
        if self.with_gt:
            out["gt"] = np.full((5, 12), i, dtype=np.float32)
        return out

    def inference_item(self, i):
        out = self[i]
        out.pop("gt", None)
        return out


def test_loader_order_and_shapes():
    dl = DataLoader(ToyDataset(10), batch_size=4, num_workers=3)
    batches = list(dl)
    assert len(batches) == 3
    assert batches[0]["image"].shape == (4, 4, 6, 3)
    assert batches[0]["gt"].shape == (4, 5, 12)
    # deterministic order without shuffle
    np.testing.assert_allclose(batches[0]["image"][:, 0, 0, 0], [0, 1, 2, 3])
    assert batches[2]["image"].shape[0] == 2  # remainder batch
    assert batches[2]["num_valid"] == 2


def test_loader_drop_last_and_shuffle():
    dl = DataLoader(ToyDataset(10), batch_size=4, shuffle=True, drop_last=True, seed=0)
    batches = list(dl)
    assert len(batches) == 2
    seen = sorted(
        int(v) for b in batches for v in b["image"][:, 0, 0, 0]
    )
    assert len(seen) == 8 and len(set(seen)) == 8


def test_loader_pad_last():
    dl = DataLoader(ToyDataset(10), batch_size=4, pad_last=True)
    last = list(dl)[-1]
    assert last["image"].shape[0] == 4
    assert last["num_valid"] == 2
    # padded entries repeat the last sample
    assert last["image"][3, 0, 0, 0] == last["image"][1, 0, 0, 0]


def test_loader_inference_mode():
    dl = DataLoader(ToyDataset(4), batch_size=2, inference=True)
    b = next(iter(dl))
    assert "gt" not in b
    assert len(b["image_metas"]) == 2


def test_prefetch_early_exit_stops_producer():
    """Breaking out of a prefetched epoch (e.g. --num_iters) must terminate
    the producer thread instead of leaving it parked on a full queue
    pinning device batches."""
    import threading
    import time

    gen = prefetch_to_device(
        iter(DataLoader(ToyDataset(64), 1)), size=1, to_device=lambda b: b
    )
    next(gen)  # producer is now running and blocked on the full queue
    assert any(t.name == "sqdt-prefetch" for t in threading.enumerate())
    gen.close()

    deadline = time.time() + 5.0
    while time.time() < deadline:
        if not any(t.name == "sqdt-prefetch" for t in threading.enumerate()):
            break
        time.sleep(0.05)
    assert not any(t.name == "sqdt-prefetch" for t in threading.enumerate())


def test_prefetch_to_device_passthrough_and_transform():
    dl = DataLoader(ToyDataset(6), batch_size=2)
    seen = list(prefetch_to_device(iter(dl), size=2, to_device=lambda b: b))
    assert len(seen) == 3

    def boom(_):
        raise RuntimeError("loader failure")

    with pytest.raises(RuntimeError, match="loader failure"):
        list(prefetch_to_device(iter(DataLoader(ToyDataset(2), 1)), 1, boom))
