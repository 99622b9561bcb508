"""Training engine: epoch loops over the jitted SPMD train/val steps.

The device-side work (fwd, loss, bwd, clip, SGD update, gradient all-reduce
across the mesh) is one compiled call; this class owns the host loop:
batch prefetch, metric averaging, interval printing, LR schedule
(epoch-level StepLR), and the per-epoch timing surface the reference
exposes (src/engine/trainer.py:18-73).
"""

from __future__ import annotations

import collections
import itertools
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from squeezedet_tpu.data.loader import DataLoader, prefetch_to_device
from squeezedet_tpu.parallel.mesh import make_mesh, replicate, shard_batch_arrays
from squeezedet_tpu.parallel.train import (
    TaskSpec,
    TrainState,
    init_train_state,
    make_train_step,
    make_train_step_multi,
    make_val_step,
    schedule_lr,
)

METRICS = ("loss", "class_loss", "score_loss", "bbox_loss")


class Trainer:
    def __init__(self, params, task: TaskSpec, cfg, mesh=None):
        self.task = task
        self.cfg = cfg
        n_model = max(1, int(getattr(cfg, "model_parallel", 1)))
        if mesh is None:
            n = cfg.data_parallel
            if n == 0:
                # auto: largest device count that divides the batch evenly
                n = len(jax.devices()) // n_model
                if n < 1:
                    raise ValueError(
                        f"--model_parallel {n_model} needs at least "
                        f"{n_model} devices, but only "
                        f"{len(jax.devices())} are visible"
                    )
                while cfg.batch_size % n != 0:
                    n -= 1
            if n_model > 1:
                from squeezedet_tpu.parallel.tensor import make_tp_mesh

                mesh = make_tp_mesh(n, n_model)
            else:
                mesh = make_mesh(n)
        self.mesh = mesh
        self.n_data = (
            self.mesh.shape["data"] if "data" in self.mesh.axis_names
            else self.mesh.size
        )
        if cfg.batch_size % self.n_data != 0:
            raise ValueError(
                f"batch_size {cfg.batch_size} not divisible by the data axis "
                f"({self.n_data} devices)"
            )

        if n_model > 1:
            # tensor parallelism: weights channel-sharded on the model axis
            # (Megatron column/row plan, parallel/tensor.py), batch sharded
            # on the data axis — a 2-D (data, model) mesh
            from squeezedet_tpu.parallel.tensor import shard_train_state_tp

            self.state = shard_train_state_tp(
                self.mesh, init_train_state(params, task), task.model.arch
            )
        else:
            self.state = replicate(self.mesh, init_train_state(params, task))
        self.anchors = replicate(self.mesh, jnp.asarray(cfg.anchors))
        self.rng = replicate(self.mesh, jax.random.PRNGKey(cfg.seed))
        self.rgb_stats = None
        if getattr(cfg, "fast_pipeline", False):
            self.rgb_stats = replicate(
                self.mesh,
                jnp.stack(
                    [
                        jnp.asarray(np.ravel(cfg.rgb_mean), jnp.float32),
                        jnp.asarray(np.ravel(cfg.rgb_std), jnp.float32),
                    ]
                ),
            )
        self.k_dispatch = max(1, int(getattr(cfg, "steps_per_dispatch", 1)))
        n_accum = max(1, int(getattr(cfg, "grad_accum", 1)))
        if n_accum > 1:
            # gradient accumulation: one update per n_accum microbatch
            # backwards (make_train_step_accum); the fused-k dispatch is
            # disabled — the scan over microbatches already amortizes the
            # dispatch round-trip the same way
            if n_model > 1:
                raise ValueError(
                    "--grad_accum with --model_parallel is not supported yet"
                )
            if cfg.batch_size % n_accum:
                raise ValueError(
                    f"batch_size {cfg.batch_size} not divisible by "
                    f"grad_accum {n_accum}"
                )
            from squeezedet_tpu.parallel.train import make_train_step_accum

            self.train_step = make_train_step_accum(task, n_accum)
            self.train_step_multi = None
            self.k_dispatch = 1
        elif n_model > 1:
            from squeezedet_tpu.parallel.tensor import (
                make_tp_train_step,
                make_tp_train_step_multi,
            )

            self.train_step = make_tp_train_step(task, self.mesh, self.state)
            self.train_step_multi = (
                make_tp_train_step_multi(task, self.mesh, self.state)
                if self.k_dispatch > 1 else None
            )
        else:
            self.train_step = make_train_step(task)
            self.train_step_multi = (
                make_train_step_multi(task) if self.k_dispatch > 1 else None
            )
        self.val_step = make_val_step(task)
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

    def _shard(self, batch):
        return shard_batch_arrays(self.mesh, batch)

    def run_epoch(self, phase: str, epoch: int, loader: DataLoader) -> dict[str, float]:
        start_time = time.time()
        num_iters = len(loader) if self.cfg.num_iters < 0 else self.cfg.num_iters
        lr = self.learning_rate(epoch)

        sums = {m: 0.0 for m in self.metrics}
        count = 0
        data_ms = net_ms = 0.0
        end = time.time()

        # bound the raw iterator *before* prefetching so the producer thread
        # never pulls (or pins in HBM) batches past a --num_iters truncation
        raw = iter(loader)
        batches = prefetch_to_device(
            itertools.islice(raw, num_iters),
            size=self.cfg.prefetch,
            to_device=self._shard,
        )
        # stats from the last few steps stay un-synced on device, so the
        # next dispatch overlaps both device compute and the D2H readback
        pending: collections.deque = collections.deque()
        window = max(2, self.cfg.prefetch)

        # train steps are fused k-at-a-time into one dispatch (lax.scan) so
        # the tunnel round-trip is paid once per k optimizer steps
        k = self.k_dispatch if phase == "train" else 1
        chunk: list = []
        chunk_data_ms = 0.0

        def dispatch(chunk, first_iter, data_ms):
            if len(chunk) == 1 or self.train_step_multi is None:
                for j, b in enumerate(chunk):
                    self.state, stats = self.train_step(
                        self.state, b["image"], b["gt"], self.anchors,
                        lr, self.rng, self.rgb_stats,
                    )
                    pending.append(
                        (stats, first_iter + j, b["image"].shape[0], data_ms, 1)
                    )
                    data_ms = 0.0
            else:
                imgs = tuple(b["image"] for b in chunk)
                gts = tuple(b["gt"] for b in chunk)
                self.state, stats = self.train_step_multi(
                    self.state, imgs, gts, self.anchors, lr, self.rng,
                    self.rgb_stats,
                )
                pending.append(
                    (stats, first_iter, chunk[0]["image"].shape[0], data_ms,
                     len(chunk))
                )

        seen = 0
        try:
            for iter_id, batch in enumerate(batches):
                seen = iter_id + 1
                data_ms = 1000.0 * (time.time() - end)
                end = time.time()

                if phase == "train":
                    chunk.append(batch)
                    chunk_data_ms += data_ms
                    if len(chunk) == k:
                        dispatch(chunk, iter_id - k + 1, chunk_data_ms)
                        chunk, chunk_data_ms = [], 0.0
                else:
                    # val scores the weights we'd deploy (EMA under
                    # --ema_decay), so --no_eval best-selection picks the
                    # same model that model_best saves
                    stats = self.val_step(
                        self.eval_params, batch["image"], batch["gt"],
                        self.anchors, self.rgb_stats,
                    )
                    pending.append(
                        (stats, iter_id, batch["image"].shape[0], data_ms, 1)
                    )

                if len(pending) > window:
                    count += self._consume(
                        pending.popleft(), sums, phase, epoch, num_iters
                    )

                net_ms = 1000.0 * (time.time() - end)
                end = time.time()

            if chunk:  # remainder smaller than k: single-step dispatches
                first = seen - len(chunk)
                for j, b in enumerate(chunk):
                    dispatch([b], first + j, chunk_data_ms if j == 0 else 0.0)

            while pending:
                count += self._consume(pending.popleft(), sums, phase, epoch, num_iters)
        finally:
            batches.close()  # stops the prefetch producer thread
            if hasattr(raw, "close"):
                raw.close()  # shuts the loader's worker pool down

        stats_out = {m: sums[m] / max(count, 1) for m in self.metrics}
        stats_out["epoch_time"] = (time.time() - start_time) / 60.0
        if phase == "train":
            stats_out["lr"] = lr  # observability for --lr_schedule/--warmup
        return stats_out

    def _consume(self, pending, sums, phase, epoch, num_iters):
        stats, first_iter, n, data_ms, k = pending
        # one D2H sync per dispatch: scalar stats for single steps, (k,)
        # vectors when k optimizer steps were fused into one dispatch
        host = {m: np.atleast_1d(np.asarray(stats[m])) for m in self.metrics}
        total = 0
        for j in range(k):
            vals = {m: float(host[m][j]) for m in self.metrics}
            iter_id = first_iter + j
            if not np.isfinite(vals["loss"]):
                # failure detection: a non-finite loss poisons momentum and
                # every later step — fail loudly instead of training on
                raise FloatingPointError(
                    f"non-finite loss at epoch {epoch} iter {iter_id} "
                    f"({phase}): {vals}"
                )
            for m in self.metrics:
                sums[m] += vals[m] * n
            total += n
            if iter_id % self.cfg.print_interval == 0:
                msg = f"epoch {epoch:<3d} {phase:<5s} [{iter_id}/{num_iters}] "
                msg += " ".join(f"| {m} {vals[m]:.3f}" for m in self.metrics)
                msg += f" | data {data_ms:.1f}ms"
                print(msg)
        return total

    def train_epoch(self, epoch: int, loader: DataLoader) -> dict[str, float]:
        return self.run_epoch("train", epoch, loader)

    def val_epoch(self, epoch: int, loader: DataLoader) -> dict[str, float]:
        return self.run_epoch("val", epoch, loader)
