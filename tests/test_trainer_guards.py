"""Trainer failure detection: a diverging run must fail loudly."""

import numpy as np
import pytest

from squeezedet_tpu.config import Config
from squeezedet_tpu.data.loader import DataLoader
from squeezedet_tpu.engine.trainer import Trainer
from squeezedet_tpu.models.squeezedet import init_params

from tests.test_e2e import TinyKITTI, _make_kitti_tree

import jax


def test_nan_guard_raises(tmp_path):
    _make_kitti_tree(str(tmp_path / "data"))
    cfg = Config(
        mode="train", batch_size=2, num_workers=2,
        lr=1e12,  # guaranteed divergence within a few steps
        grad_norm=1e30,  # disable the clip so the explosion goes through
        num_epochs=3, drift_prob=0.0, flip_prob=0.0,
    )
    cfg.finalize_dirs(root_dir=str(tmp_path))
    cfg.data_dir = str(tmp_path / "data")
    cfg.save_dir = str(tmp_path / "exp")
    cfg.debug_dir = str(tmp_path / "exp" / "debug")

    ds = TinyKITTI("train", cfg)
    cfg.update_dataset_info(ds)
    from squeezedet_tpu.train import build_task

    task = build_task(cfg)
    trainer = Trainer(init_params(jax.random.PRNGKey(0), task.model), task, cfg)
    loader = DataLoader(ds, batch_size=2, num_workers=2, drop_last=True)

    with pytest.raises(FloatingPointError, match="non-finite loss"):
        for epoch in range(1, 4):
            trainer.train_epoch(epoch, loader)


def _trainer_cfg(tmp_path, **overrides):
    kwargs = dict(
        mode="train", batch_size=2, num_workers=2,
        num_epochs=1, drift_prob=0.0, flip_prob=0.0, dropout_prob=0.0,
    )
    kwargs.update(overrides)
    cfg = Config(**kwargs)
    cfg.finalize_dirs(root_dir=str(tmp_path))
    cfg.data_dir = str(tmp_path / "data")
    cfg.save_dir = str(tmp_path / "exp")
    cfg.debug_dir = str(tmp_path / "exp" / "debug")
    return cfg


def test_trainer_multi_dispatch_equals_single(tmp_path):
    """An epoch driven with steps_per_dispatch=3 (2 fused dispatches + 1
    single-step remainder over 7 batches) must produce the same params and
    averaged stats as plain per-step dispatch."""
    _make_kitti_tree(str(tmp_path / "data"), n_images=14)

    results = {}
    for k in (1, 3):
        cfg = _trainer_cfg(tmp_path, steps_per_dispatch=k)
        ds = TinyKITTI("train", cfg)
        cfg.update_dataset_info(ds)
        from squeezedet_tpu.train import build_task

        task = build_task(cfg)
        trainer = Trainer(
            init_params(jax.random.PRNGKey(0), task.model), task, cfg
        )
        loader = DataLoader(ds, batch_size=2, num_workers=2, drop_last=True, seed=1)
        stats = trainer.train_epoch(1, loader)
        results[k] = (stats, jax.device_get(trainer.params))

    s1, p1 = results[1]
    s3, p3 = results[3]
    assert abs(s1["loss"] - s3["loss"]) < 1e-5
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_eval_refuses_random_weights():
    """eval with no --load_model must refuse loudly instead of scoring
    fresh random weights as a plausible-looking mAP~0 run."""
    from squeezedet_tpu.eval import evaluate

    cfg = Config(mode="eval", load_model="")
    with pytest.raises(SystemExit, match="load_model"):
        evaluate(cfg)


def test_device_trainer_dispatch_watchdog(monkeypatch):
    """A wedged device readback must raise with resume instructions, not
    hang forever (observed relay pathology; engine/device_trainer.py)."""
    import time as _time

    import pytest

    from squeezedet_tpu.engine.device_trainer import DeviceTrainer

    class FakeCfg:
        dispatch_timeout_s = 0.2
        save_dir = "/tmp/x"

    trainer = DeviceTrainer.__new__(DeviceTrainer)  # skip heavy __init__
    trainer.cfg = FakeCfg()

    import squeezedet_tpu.engine.device_trainer as dt

    monkeypatch.setattr(
        dt.jax, "device_get", lambda s: _time.sleep(5.0)
    )
    with pytest.raises(RuntimeError, match="resume"):
        trainer._fetch_guarded({"loss": None}, "epoch 7")

    # the generic guard covers staging H2D too (a wedge before the first
    # epoch must die loudly — the supervisor can't see a silent hang)
    with pytest.raises(RuntimeError, match="staging H2D"):
        trainer._guarded(lambda: _time.sleep(5.0), "train staging H2D")

    # errors inside the guarded call surface as themselves, not timeouts
    def boom():
        raise ValueError("bad stage")

    with pytest.raises(ValueError, match="bad stage"):
        trainer._guarded(boom, "train staging H2D")


def test_guarded_backend_init_fast_path():
    """Normal init (backend already up on the CPU test mesh) returns."""
    from squeezedet_tpu.utils.misc import guarded_backend_init

    guarded_backend_init(30.0)  # must not raise or exit
    guarded_backend_init(0.0)   # disabled: no-op


def test_guarded_backend_init_propagates_errors(monkeypatch):
    """A backend that fails (vs hangs) must surface the real exception."""
    from squeezedet_tpu.utils.misc import guarded_backend_init

    def boom():
        raise RuntimeError("no backend for you")

    monkeypatch.setattr(jax, "devices", boom)
    with pytest.raises(RuntimeError, match="no backend"):
        guarded_backend_init(30.0)


def test_guarded_backend_init_exits_on_wedge():
    """A wedged init RPC must exit crash-only rc=14 (supervisor restarts);
    observed in production: the relay wedged the init RPC itself on the
    plus_ft300 epoch-287 resume, before the dispatch watchdog could arm."""
    import os
    import subprocess
    import sys

    code = (
        "import time, jax\n"
        "jax.devices = lambda: time.sleep(60)\n"
        "from squeezedet_tpu.utils.misc import guarded_backend_init\n"
        "guarded_backend_init(0.3)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 14, proc.stderr
    assert "init-watchdog" in proc.stdout


def test_guarded_backend_init_exits_on_first_execute_wedge():
    """The sibling outage mode (observed live 2026-08-19): jax.devices()
    SUCCEEDS but the first execute RPC blocks forever. The init guard
    probes one tiny execute + readback, so this mode must also exit
    rc=14 instead of hanging between the two watchdogs."""
    import os
    import subprocess
    import sys

    code = (
        "import time, jax\n"
        "jax.device_get = lambda x: time.sleep(60)\n"
        "from squeezedet_tpu.utils.misc import guarded_backend_init\n"
        "guarded_backend_init(0.5)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 14, proc.stderr
    assert "init-watchdog" in proc.stdout


# ---------------------------------------------------------------------------
# TPU-claim yield protocol (utils/yieldfile.py): bench.py requests the
# single relay claim via a sentinel file; training releases it at the next
# epoch boundary with a resumable state_last and rc=15.


def test_yieldfile_lifecycle_and_staleness(tmp_path, monkeypatch):
    import subprocess
    import sys

    monkeypatch.setenv("SQDT_YIELD_FILE", str(tmp_path / "yield"))
    from squeezedet_tpu.utils import yieldfile

    assert not yieldfile.yield_requested()
    yieldfile.request_yield()
    assert yieldfile.yield_requested()  # our own pid is alive
    yieldfile.clear_yield()
    assert not yieldfile.yield_requested()
    yieldfile.clear_yield()  # idempotent

    # stale sentinel: requester pid is dead -> auto-removed, reported False
    holder = subprocess.Popen([sys.executable, "-c", "pass"])
    holder.wait()
    (tmp_path / "yield").write_text(str(holder.pid))
    assert not yieldfile.yield_requested()
    assert not (tmp_path / "yield").exists()

    # unparsable body is treated as stale too
    (tmp_path / "yield").write_text("not-a-pid")
    assert not yieldfile.yield_requested()
    assert not (tmp_path / "yield").exists()


def test_train_yields_on_request(tmp_path, monkeypatch):
    """A pre-set yield sentinel makes train() save state_last and exit
    rc=15 before dispatching the epoch (the bench handshake's train
    side)."""
    import os

    _make_kitti_tree(str(tmp_path / "data"))
    cfg = _trainer_cfg(tmp_path, num_epochs=3)

    monkeypatch.setenv("SQDT_YIELD_FILE", str(tmp_path / "yield"))
    from squeezedet_tpu.utils import yieldfile

    yieldfile.request_yield()

    import squeezedet_tpu.train as train_mod

    monkeypatch.setattr(train_mod, "load_dataset", lambda name: TinyKITTI)
    with pytest.raises(SystemExit) as ei:
        train_mod.train(cfg)
    assert ei.value.code == yieldfile.YIELD_EXIT_CODE
    assert os.path.isdir(os.path.join(cfg.save_dir, "state_last"))
    yieldfile.clear_yield()
