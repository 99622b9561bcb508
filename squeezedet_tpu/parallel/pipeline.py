"""Pipeline (stage) parallelism: GPipe-style microbatching over a device chain.

The reference has no pipeline parallelism (its only strategy is batch-axis
DataParallel, src/utils/data_parallel.py:93-113); this module exceeds it.
SqueezeDet's stages are shape-heterogeneous (pools halve the grid, fires
change widths), so the TPU-native formulation is NOT a stacked-weights
shard_map — it is computation-follows-data: each stage is its own jitted
program whose params live on one device of the chain, activations hop
device-to-device between stages, and JAX's async dispatch overlaps stage k
on microbatch m with stage k-1 on microbatch m+1. No scheduler thread, no
hand-rolled send/recv — the per-device execution streams ARE the pipeline.

- **Stage split** balances conv FLOPs (same recurrence as
  models/squeezedet.arch_flops) over contiguous op runs, so no stage is
  the straggler that sets the pipeline period.
- **Inference** (`Pipeline.predict`): microbatches stream through the
  chain; on-device postprocess (decode/top-K/NMS) runs on the last device.
- **Training** (`Pipeline.loss_and_grads`): GPipe with recompute — the
  forward stash keeps only each stage's INPUT; the backward re-runs the
  stage forward inside its vjp (rematerialisation, the standard
  memory/FLOPs trade on TPU). Per-stage grads accumulate on their own
  device; nothing but the (C+5)-channel boundary activations and the
  scalar loss ever crosses devices.

When to use: a model too large for one chip's HBM, or serving chains where
stage placement rides ICI neighbours. SqueezeDet itself fits on any chip —
this exists so the framework's parallelism surface (dp/tp/sp/pp) is
complete and so the pattern is load-bearing for bigger backbones.

**Composition with data parallelism (pp x dp)**: pass ``dp > 1`` and each
stage owns a GROUP of ``dp`` devices instead of one — stage params are
replicated over the group, activations are batch-sharded across it
(NamedSharding over a per-stage 1-D mesh), and the inter-stage hop is a
``device_put`` resharding from group k's batch sharding to group k+1's.
Inside a stage the SPMD partitioner does the data-parallel work: forward
convs partition trivially on batch, and the backward's contraction over
the sharded batch dim makes XLA emit the intra-group gradient all-reduce
— exactly the collective a replicated stage chain on a real pp x dp
topology would ride over ICI. No new communication code.

Parity: predict and grads match the single-device twins exactly on the
virtual mesh, for pure pp and for pp x dp (tests/test_pipeline.py);
exercised by dryrun_multichip.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from squeezedet_tpu.models.head import resolve
from squeezedet_tpu.models.loss import detection_loss
from squeezedet_tpu.models.squeezedet import (
    ARCH_SPECS,
    _conv,
    _fire,
    _maxpool_ceil,
    _pool_geometry,
)
from squeezedet_tpu.ops.postprocess import postprocess
from squeezedet_tpu.parallel.train import TaskSpec


def _op_list(arch: str) -> list[tuple]:
    """Flatten an ARCH_SPECS topology into ordered ops:
    ('stem',) | ('pool',) | ('fire', i) | ('convdet',)."""
    ops: list[tuple] = [("stem",)]
    fire_i = 0
    for item in ARCH_SPECS[arch]["body"]:
        if item == "pool":
            ops.append(("pool",))
        else:
            ops.append(("fire", fire_i))
            fire_i += 1
    ops.append(("convdet",))
    return ops


def _op_flops(task: TaskSpec) -> list[int]:
    """Per-op conv FLOPs at task.input_size (pools cost ~0 but mark the
    spatial downsteps); mirrors models/squeezedet.arch_flops."""
    arch = ARCH_SPECS[task.model.arch]
    stem = arch["stem"]
    h = -(-task.input_size[0] // stem["stride"])
    w = -(-task.input_size[1] // stem["stride"])
    flops = [2 * h * w * stem["out"] * stem["kernel"] ** 2 * 3]
    for item in arch["body"]:
        if item == "pool":
            h, w = _pool_geometry(h, w)[:2]
            flops.append(0)
        else:
            _, cin, sq, e1, e3 = item
            flops.append(2 * h * w * (cin * sq + sq * e1 + 9 * sq * e3))
    flops.append(
        2 * h * w * 9 * arch["out_channels"] * task.model.head_channels
    )
    return flops


def split_stages(task: TaskSpec, n_stages: int) -> list[list[tuple]]:
    """Greedy contiguous split of the op list into n_stages runs of
    near-equal FLOPs (each stage closes when it reaches the remaining
    average, so later stages can't be starved)."""
    ops = _op_list(task.model.arch)
    flops = _op_flops(task)
    assert n_stages <= len(ops), (n_stages, len(ops))
    stages: list[list[tuple]] = []
    i = 0
    remaining = sum(flops)
    for s in range(n_stages):
        target = remaining / (n_stages - s)
        stage, acc = [], 0
        # leave at least one op for every remaining stage
        while i < len(ops) - (n_stages - s - 1) and (
            not stage or acc + flops[i] / 2 <= target
        ):
            stage.append(ops[i])
            acc += flops[i]
            i += 1
        remaining -= acc
        stages.append(stage)
    assert i == len(ops), (i, len(ops))
    return stages


def split_params(params, stages: list[list[tuple]]) -> list[dict]:
    """Partition the param pytree by stage ('pool' ops own no params)."""
    out = []
    for stage in stages:
        p: dict = {}
        for op in stage:
            if op[0] == "fire":
                p[f"fire{op[1]}"] = params[f"fire{op[1]}"]
            elif op[0] in ("stem", "convdet"):
                p[op[0]] = params[op[0]]
        out.append(p)
    return out


def _make_stage_fn(task: TaskSpec, stage: list[tuple]):
    """Jitted forward for one contiguous op run. The convdet op consumes an
    optional dropout rng (GPipe trains with per-microbatch rngs) and emits
    the fp32 (B, A, C+5) head tensor."""
    arch = ARCH_SPECS[task.model.arch]
    spec = task.model
    dtype = spec.compute_dtype
    has_head = ("convdet",) in stage

    def stage_fn(p, x, rng=None):
        for op in stage:
            if op == ("stem",):
                stem = arch["stem"]
                x = jax.nn.relu(
                    _conv(x, p["stem"], stride=stem["stride"], pad=stem["pad"],
                          dtype=dtype)
                )
            elif op == ("pool",):
                x = _maxpool_ceil(x)
            elif op[0] == "fire":
                x = _fire(x, p[f"fire{op[1]}"], dtype)
            else:  # convdet
                if rng is not None and spec.dropout_prob > 0:
                    keep = 1.0 - spec.dropout_prob
                    mask = jax.random.bernoulli(rng, keep, x.shape)
                    x = jnp.where(mask, x / jnp.asarray(keep, x.dtype), 0.0)
                x = _conv(x, p["convdet"], pad=1, dtype=dtype)
                b, h, w, _ = x.shape
                x = x.reshape(
                    b, h * w * spec.anchors_per_grid, spec.num_classes + 5
                ).astype(jnp.float32)
        return x

    if has_head:
        return jax.jit(stage_fn), True
    return jax.jit(lambda p, x: stage_fn(p, x)), False


@dataclass
class Pipeline:
    """A compiled stage chain. With ``dp == 1`` each stage is pinned to one
    device; with ``dp > 1`` each stage owns a dp-device group — params
    replicated over the group (``p_sh``), activations batch-sharded across
    it (``x_sh``)."""

    task: TaskSpec
    stages: list[list[tuple]]
    devices: list  # all devices used, stage-major
    x_sh: list  # per-stage activation placement (device or NamedSharding)
    p_sh: list  # per-stage param placement (device or NamedSharding)
    dp: int
    _fwd: list  # jitted stage fns
    _head_rng: list  # bool per stage: takes a dropout rng
    _bwd: list  # jitted recompute-vjp fns
    _post: object  # jitted postprocess on the last stage's devices
    _loss: object  # jitted loss + d(loss)/d(pred) on the last stage's devices

    def place_params(self, params) -> list[dict]:
        """Split + device_put the params onto the chain (replicated over
        each stage's dp group)."""
        return [
            jax.device_put(p, sh)
            for p, sh in zip(split_params(params, self.stages), self.p_sh)
        ]

    def _forward(self, staged, images, rng=None, stash=None):
        assert images.shape[0] % self.dp == 0, (images.shape, self.dp)
        x = jax.device_put(images, self.x_sh[0])
        for k, (fn, takes_rng) in enumerate(zip(self._fwd, self._head_rng)):
            if stash is not None:
                stash.append(x)
            x = fn(staged[k], x, rng) if takes_rng else fn(staged[k], x)
            if k + 1 < len(self._fwd):
                x = jax.device_put(x, self.x_sh[k + 1])
        return x

    def predict(self, staged: list[dict], microbatches, anchors):
        """Stream microbatches through the chain; returns the per-microbatch
        detection dicts. Dispatch is async — stage k runs microbatch m while
        stage k-1 runs m+1 — so issuing the whole stream before the first
        readback is what fills the pipeline."""
        anchors = jax.device_put(anchors, self.p_sh[-1])
        return [
            self._post(self._forward(staged, mb), anchors)
            for mb in microbatches
        ]

    def loss_and_grads(self, staged, image_mbs, gt_mbs, anchors, rng=None):
        """GPipe with recompute: forward stashes stage INPUTS only; backward
        re-derives each stage's vjp from its input (rematerialisation) and
        accumulates that stage's grads on its own device group (with dp > 1
        the contraction over the sharded batch dim makes XLA all-reduce the
        param grads inside the group). Returns the mean loss over
        microbatches and per-stage grad pytrees (resident on their stage
        devices), scaled to match a single full-batch mean loss of
        equal-size microbatches."""
        anchors = jax.device_put(anchors, self.p_sh[-1])
        n_mb = len(image_mbs)
        losses, grads = [], [None] * len(self.stages)
        for m, (images, gt) in enumerate(zip(image_mbs, gt_mbs)):
            mb_rng = (
                jax.random.fold_in(rng, m) if rng is not None else None
            )
            stash: list = []
            pred = self._forward(staged, images, mb_rng, stash)
            gt_d = jax.device_put(gt, self.x_sh[-1])
            loss, g = self._loss(pred, gt_d, anchors)
            losses.append(loss)
            for k in reversed(range(len(self.stages))):
                g = jax.device_put(g, self.x_sh[k])
                if self._head_rng[k]:
                    gp, g = self._bwd[k](staged[k], stash[k], g, mb_rng)
                else:
                    gp, g = self._bwd[k](staged[k], stash[k], g)
                grads[k] = (
                    gp if grads[k] is None
                    else jax.tree.map(jnp.add, grads[k], gp)
                )
        scale = 1.0 / n_mb
        grads = [jax.tree.map(lambda x: x * scale, g) for g in grads]
        return jnp.mean(jnp.stack([jax.device_put(l, self.p_sh[-1])
                                   for l in losses])), grads


def make_pipeline(
    task: TaskSpec, devices, n_stages: int | None = None, dp: int = 1
) -> Pipeline:
    """Build a pipeline over ``n_stages * dp`` devices (stage-major order:
    devices[k*dp:(k+1)*dp] form stage k's data-parallel group)."""
    devices = list(devices)
    n_stages = n_stages or len(devices) // dp
    assert dp >= 1 and len(devices) >= n_stages * dp, (
        len(devices), n_stages, dp,
    )
    devices = devices[: n_stages * dp]
    groups = [devices[k * dp:(k + 1) * dp] for k in range(n_stages)]
    if dp == 1:
        x_sh = p_sh = [g[0] for g in groups]
    else:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        meshes = [Mesh(np.asarray(g), ("data",)) for g in groups]
        x_sh = [NamedSharding(m, PartitionSpec("data")) for m in meshes]
        p_sh = [NamedSharding(m, PartitionSpec()) for m in meshes]
    stages = split_stages(task, n_stages)

    fwd, head_rng, bwd = [], [], []
    for si, stage in enumerate(stages):
        fn, takes_rng = _make_stage_fn(task, stage)
        fwd.append(fn)
        head_rng.append(takes_rng)
        # stage 0's input is the image batch: nothing consumes d loss/d x
        # there, so differentiate w.r.t. params only and skip the full
        # (B, H, W, 3) input-gradient backward conv every microbatch
        if takes_rng:
            if si == 0:

                def bwd_fn(p, x, g, rng, _fn=fn):
                    _, vjp = jax.vjp(lambda pp: _fn(pp, x, rng), p)
                    (gp,) = vjp(g)
                    return gp, None

            else:

                def bwd_fn(p, x, g, rng, _fn=fn):
                    _, vjp = jax.vjp(lambda pp, xx: _fn(pp, xx, rng), p, x)
                    return vjp(g)

        elif si == 0:

            def bwd_fn(p, x, g, _fn=fn):
                _, vjp = jax.vjp(lambda pp: _fn(pp, x), p)
                (gp,) = vjp(g)
                return gp, None

        else:

            def bwd_fn(p, x, g, _fn=fn):
                _, vjp = jax.vjp(_fn, p, x)
                return vjp(g)

        bwd.append(jax.jit(bwd_fn))

    @jax.jit
    def post(pred, anchors):
        return postprocess(
            pred, anchors,
            input_size=task.input_size,
            num_classes=task.model.num_classes,
            top_k=task.top_k,
            nms_thresh=task.nms_thresh,
            score_thresh=task.score_thresh,
            nms_method=task.nms_method,
            soft_nms_sigma=task.soft_nms_sigma,
        )

    def mb_loss(pred, gt, anchors):
        resolved = resolve(
            pred, anchors, task.input_size, task.model.num_classes,
            with_log_probs=True,
        )
        loss, _ = detection_loss(
            resolved, gt, task.num_anchors, task.loss_weights,
            bbox_loss_kind=task.bbox_loss_kind, anchors_xywh=anchors,
            iou_mix=task.bbox_iou_mix,
        )
        return loss.mean()

    @jax.jit
    def loss_and_gpred(pred, gt, anchors):
        return jax.value_and_grad(mb_loss)(pred, gt, anchors)

    return Pipeline(
        task=task, stages=stages, devices=devices,
        x_sh=x_sh, p_sh=p_sh, dp=dp,
        _fwd=fwd, _head_rng=head_rng, _bwd=bwd,
        _post=post, _loss=loss_and_gpred,
    )
