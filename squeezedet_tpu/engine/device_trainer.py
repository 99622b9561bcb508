"""Device-resident training engine: data in HBM, one dispatch per epoch.

Counterpart of :class:`squeezedet_tpu.engine.trainer.Trainer` for datasets
that fit in device memory (KITTI does: ~4.9 GB train + ~1.4 GB val as
uint8). The host's role shrinks to: upload everything once at startup
(before the first execute — see CLAUDE.md on the axon tunnel), then per
epoch send one PRNG key and read back a (steps, 4) stats array. The whole
data path — batch gather, drift/flip/resize augmentation, GT->anchor
encoding — runs inside the jitted epoch program (parallel/epoch.py).

This replaces the reference's multi-worker DataLoader + per-batch H2D
(src/train.py:40-50, src/engine/trainer.py:36-38) with a design that is
host-independent: epoch wall time equals device compute time plus one
tunnel round-trip, on any host.
"""

from __future__ import annotations

import time

import jax
import numpy as np

from squeezedet_tpu.core.boxes import boxes_postprocess
from squeezedet_tpu.data.device_data import stage_dataset
from squeezedet_tpu.parallel.epoch import (
    EpochSpec,
    locate_sample,
    make_predict_epoch,
    make_train_epoch,
    make_val_epoch,
    put_device_data,
)
from squeezedet_tpu.parallel.mesh import make_mesh, replicate
from squeezedet_tpu.parallel.train import TaskSpec, init_train_state, schedule_lr

METRICS = ("loss", "class_loss", "score_loss", "bbox_loss")


class DeviceTrainer:
    """Trainer-compatible engine over device-resident train/val data."""

    def __init__(self, params, task: TaskSpec, cfg, train_dataset,
                 val_dataset=None, mesh=None):
        self.task = task
        self.cfg = cfg
        if mesh is None:
            n = cfg.data_parallel
            if n == 0:
                n = len(jax.devices())
                while cfg.batch_size % n != 0:
                    n -= 1
            mesh = make_mesh(n)
        self.mesh = mesh
        if cfg.batch_size % self.mesh.size != 0:
            raise ValueError(
                f"batch_size {cfg.batch_size} not divisible by mesh size "
                f"{self.mesh.size}"
            )

        if getattr(cfg, "forbid_resize", False):
            raise ValueError(
                "--device_data implements the resize preprocessing path "
                "only; --forbid_resize (center crop/pad) needs the host "
                "pipeline — drop one of the two flags"
            )
        if getattr(cfg, "num_iters", -1) > 0:
            print(
                "[device_data] --num_iters is ignored: the HBM-resident "
                "path always runs full epochs (one dispatch per epoch)"
            )

        spec = EpochSpec(
            num_classes=cfg.num_classes,
            out_size=tuple(cfg.input_size),
            drift_prob=cfg.drift_prob,
            flip_prob=cfg.flip_prob,
            rgb_mean=tuple(np.ravel(cfg.rgb_mean).tolist()),
            rgb_std=tuple(np.ravel(cfg.rgb_std).tolist()),
            match_iou=getattr(cfg, "match_iou", 0.0),
            erase_prob=getattr(cfg, "erase_prob", 0.0),
        )
        self.spec = spec

        # stage + upload BEFORE any execute (tunnel H2D degradation);
        # max_objects 0/unset = auto-size from the dataset (real-KITTI
        # frames can exceed the old hard 16-object cap)
        max_objects = getattr(cfg, "max_objects", 0) or None
        staged_train = stage_dataset(train_dataset, max_objects)
        # staging H2D is the same wedge-prone relay RPC class as dispatch
        # readbacks — guard it, or a wedge here hangs before the first
        # epoch and the supervisor never sees the process die
        self.train_data, n_loc_train, hw_train = self._guarded(
            lambda: put_device_data(mesh, staged_train), "train staging H2D"
        )
        self.val_dataset = val_dataset
        self.val_data = None
        if val_dataset is not None:
            staged_val = stage_dataset(val_dataset, max_objects)
            # pad — never trim — the val set to a full mesh×batch multiple
            # so every sample id gets a real result file (the reference
            # evaluates every id; empty placeholders only for no-detection
            # frames, src/engine/detector.py:33-35)
            self.val_data, n_loc_val, hw_val = self._guarded(
                lambda: put_device_data(
                    mesh, staged_val, pad_to_batch=cfg.batch_size
                ),
                "val staging H2D",
            )
            self._n_loc_val = n_loc_val
            self._b_loc = cfg.batch_size // mesh.size
            self._val_ids = list(staged_val.sample_ids)
            self._val_sizes = np.asarray(staged_val.sizes)

        anchors_np = np.asarray(cfg.anchors, np.float32)
        self.train_epoch_fn, self.train_steps = make_train_epoch(
            task, spec, mesh, anchors_np, n_loc_train, cfg.batch_size, hw_train
        )
        if val_dataset is not None:
            self.val_epoch_fn, self.val_steps = make_val_epoch(
                task, spec, mesh, anchors_np, n_loc_val, cfg.batch_size,
                hw_val, n_valid=len(self._val_ids),
            )
            self.predict_epoch_fn, _ = make_predict_epoch(
                task, spec, mesh, anchors_np, n_loc_val, cfg.batch_size,
                hw_val, tta_flip=bool(getattr(cfg, "tta_flip", False)),
            )

        self.state = replicate(self.mesh, init_train_state(params, task))
        self._base_key = jax.random.PRNGKey(cfg.seed)
        self.metrics = list(METRICS)

    @property
    def params(self):
        return self.state.params

    @property
    def eval_params(self):
        """Weights to evaluate / save as model_best: the EMA shadow when
        --ema_decay is on, the live params otherwise."""
        return self.state.ema if self.state.ema is not None else self.state.params

    def learning_rate(self, epoch: int) -> float:
        return schedule_lr(self.cfg, epoch)

    def _summarize(self, stats, phase, epoch, minutes, weights=None):
        """``weights``: optional per-step real-sample counts (val path) so
        wrap-padded steps don't bias the epoch mean."""
        host = {m: np.asarray(stats[m]) for m in self.metrics}
        if not np.all(np.isfinite(host["loss"])):
            bad = int(np.argmax(~np.isfinite(host["loss"])))
            raise FloatingPointError(
                f"non-finite loss at epoch {epoch} step {bad} ({phase}): "
                f"{ {m: float(host[m][bad]) for m in self.metrics} }"
            )
        out = {
            m: float(np.average(host[m], weights=weights))
            for m in self.metrics
        }
        out["epoch_time"] = minutes
        steps = host["loss"].shape[0]
        stride = max(1, self.cfg.print_interval)
        for s in range(0, steps, stride):
            msg = f"epoch {epoch:<3d} {phase:<5s} [{s}/{steps}] "
            msg += " ".join(
                f"| {m} {float(host[m][s]):.3f}" for m in self.metrics
            )
            print(msg)
        return out

    def _guarded(self, fn, what: str):
        """Run a relay-touching call under a hang watchdog.

        Production failure modes: a relay RPC can wedge forever mid-run
        (observed: D2H readback at hard300 epoch 235, backend init at the
        plus_ft300 epoch-287 resume) and the H2D staging path is the same
        class of RPC. The call runs in a worker thread; if it exceeds the
        timeout we raise loudly with resume instructions instead of
        hanging — a silent hang evades the supervisor entirely because
        the process never dies. 0 disables. The wedged RPC cannot be
        cancelled in-process (the TPU claim is single-owner), so
        fail-fast + --resume is the recovery."""
        timeout_s = float(getattr(self.cfg, "dispatch_timeout_s", 600.0))
        if timeout_s <= 0:
            return fn()
        # a DAEMON thread, not ThreadPoolExecutor: futures' worker threads
        # are non-daemon and concurrent.futures' atexit hook joins them,
        # so a wedged readback would block interpreter exit right after
        # the watchdog fired (observed in production at plus150 epoch
        # 251: traceback printed, process never exited, supervisor never
        # got to resume). Daemon threads are abandoned at exit.
        import queue
        import threading

        out: queue.Queue = queue.Queue(maxsize=1)

        def work():
            try:
                out.put((True, fn()))
            except BaseException as e:  # surface device errors too
                out.put((False, e))

        threading.Thread(target=work, daemon=True).start()
        try:
            ok, result = out.get(timeout=timeout_s)
        except queue.Empty:
            raise RuntimeError(
                f"{what} stalled > {timeout_s:.0f}s — the TPU relay RPC "
                "has likely wedged (known axon pathology, see CLAUDE.md). "
                "Kill this process and resume with "
                f"--resume {self.cfg.save_dir}/state_last"
            ) from None
        if not ok:
            raise result
        return result

    def _fetch_guarded(self, stats, label):
        """D2H readback with the hang watchdog (see _guarded); ``label``
        names the phase for the stall diagnostic (e.g. "epoch 12", "eval")."""
        return self._guarded(
            lambda: jax.device_get(stats), f"device readback at {label}"
        )

    def train_epoch(self, epoch: int, loader=None) -> dict[str, float]:
        start = time.time()
        key = jax.random.fold_in(self._base_key, epoch)
        lr = self.learning_rate(epoch)
        self.state, stats = self.train_epoch_fn(
            self.state, self.train_data, lr, key
        )
        stats = self._fetch_guarded(stats, f"epoch {epoch}")  # one D2H sync per epoch
        out = self._summarize(
            stats, "train", epoch, (time.time() - start) / 60.0
        )
        out["lr"] = lr  # observability for --lr_schedule/--warmup_epochs
        return out

    def val_epoch(self, epoch: int, loader=None) -> dict[str, float]:
        start = time.time()
        stats = self._fetch_guarded(
            self.val_epoch_fn(self.eval_params, self.val_data),
            f"val epoch {epoch}",
        )
        stats = dict(stats)
        weights = np.asarray(stats.pop("num_valid"))
        return self._summarize(
            stats, "val", epoch, (time.time() - start) / 60.0,
            weights=weights,
        )

    def evaluate_val(self) -> dict[str, float]:
        """Detect the resident val set in one dispatch, write KITTI result
        txts, run the native evaluator (Trainer-mode twin: eval.py)."""
        dets = self._fetch_guarded(
            self.predict_epoch_fn(self.eval_params, self.val_data), "eval"
        )
        results = []
        oh, ow = self.spec.out_size
        # val data is padded to a full mesh×batch multiple at staging, so
        # every real id maps to a computed slot; the epoch outputs are
        # device-major within each batch (see locate_sample)
        for i, image_id in enumerate(self._val_ids):
            step, pos = locate_sample(i, self._n_loc_val, self._b_loc)
            keep = dets["keep"][step][pos]
            h, w = self._val_sizes[i]
            meta = {
                "image_id": image_id,
                "orig_size": np.array([h, w, 3], np.int32),
                "scales": np.array([oh / h, ow / w], np.float32),
            }
            res = {"image_meta": meta}
            if keep.any():
                res.update(
                    class_ids=dets["class_ids"][step][pos][keep],
                    scores=dets["scores"][step][pos][keep],
                    boxes=boxes_postprocess(
                        dets["boxes"][step][pos][keep], meta
                    ),
                )
            results.append(res)
        self.val_dataset.save_results(results)
        return self.val_dataset.evaluate()
