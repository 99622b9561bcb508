"""Whole-epoch jitted steps over a device-resident dataset.

The training data path of the reference (host DataLoader -> H2D per batch,
src/train.py:40-50 + src/engine/trainer.py:36-38) becomes, TPU-natively:
the dataset lives in HBM (data/device_data.py), and ONE dispatch runs an
entire epoch as `lax.scan` over steps — each step gathers its batch from
the resident arrays, augments (ops/augment.py), GT-encodes
(ops/encode.py) and applies the SGD update, all on device. Host traffic
per epoch is a PRNG key in and a (steps, stats) readback out, so training
throughput is independent of the host core count and of the axon tunnel's
per-call RTT / intermittent H2D degradation (CLAUDE.md).

Sharding: images are sharded over the mesh's data axis on the sample
dimension, all metadata (boxes/classes/counts/sizes — a few MB) is
replicated. Each device draws an independent per-epoch permutation of its
OWN image shard (hierarchical shuffle: shard assignment is fixed, order
within the shard is uniform — the standard distributed-input pattern);
only the image gather runs under `shard_map`, everything downstream is
ordinary auto-sharded SPMD, so the gradient all-reduce is still inserted
by XLA exactly as in parallel/train.py.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from squeezedet_tpu.ops.augment import (
    apply_erase,
    sample_aug_params,
    sample_erase_params,
    transform_boxes,
    warp_batch,
)
from squeezedet_tpu.ops.box_ops import xywh_to_xyxy
from squeezedet_tpu.ops.encode import encode_annotations_device
from squeezedet_tpu.parallel.mesh import DATA_AXIS
from squeezedet_tpu.parallel.train import (
    TaskSpec,
    _loss_for_batch,
    _predict_batch,
    _sgd_step,
    make_optimizer,
)


class DeviceData(NamedTuple):
    """Resident dataset: images sharded on axis 0, metadata replicated.

    Images are stored FLATTENED to (N, Hs*Ws*3): with the natural 4-D NHWC
    shape, XLA chooses a transposed tiled layout for the in-scan gather and
    materializes two full layout-conversion copies of the multi-GB operand
    (9.4 GB of HLO temp on KITTI — instant OOM). As a 2-D row-major array
    the gather is a plain row fetch with no layout conversion; the batch
    reshapes back to (B, Hs, Ws, 3) after the gather.
    """

    images: jnp.ndarray     # (ndev * n_loc, Hs*Ws*3) uint8, sharded
    boxes: jnp.ndarray      # (N, M, 4) float32
    class_ids: jnp.ndarray  # (N, M) int32
    counts: jnp.ndarray     # (N,) int32
    sizes: jnp.ndarray      # (N, 2) int32


def put_device_data(
    mesh, staged, pad_to_batch: int | None = None
) -> tuple[DeviceData, int, tuple[int, int]]:
    """Upload staged arrays; returns (data, n_loc, storage_hw).

    Default (train data): trims the sample count down to a multiple of the
    mesh size so every device holds an equal shard (the <ndev remainder is
    at most a fraction of one batch; the per-epoch shuffle resamples the
    shard anyway — reference drop_last semantics, src/train.py:41).

    ``pad_to_batch=batch_size`` (val/eval data): pads the sample count UP
    to a multiple of batch_size by wrapping around to the first samples, so
    every real sample is covered by some (step, position) of the epoch
    programs and none is silently dropped or scored as empty. Callers track
    the real count themselves (len(staged)); padded tail slots are simply
    ignored on readback.

    Must run before the first execute on the axon tunnel (H2D can degrade
    ~60x once the device has executed — see CLAUDE.md).
    """
    ndev = mesh.size
    n, hs, ws = staged.images.shape[:3]
    if pad_to_batch is not None:
        if pad_to_batch % ndev != 0:
            raise ValueError(
                f"pad_to_batch {pad_to_batch} not divisible by mesh size {ndev}"
            )
        n_use = -(-n // pad_to_batch) * pad_to_batch
        if n_use == n:
            # already a full multiple: skip the fancy-index copy of the
            # multi-GB image array
            def take(a):
                return np.asarray(a)
        else:
            sel = np.arange(n_use) % n  # wrap-around padding indices

            def take(a):
                return np.asarray(a)[sel]

    else:
        n_use = (n // ndev) * ndev

        def take(a):  # slice view — no host copy of the multi-GB images
            return np.asarray(a[:n_use])

    img_sharding = NamedSharding(mesh, P(DATA_AXIS))
    rep = NamedSharding(mesh, P())
    data = DeviceData(
        images=jax.device_put(
            take(staged.images).reshape(n_use, -1), img_sharding
        ),
        boxes=jax.device_put(take(staged.boxes), rep),
        class_ids=jax.device_put(take(staged.class_ids), rep),
        counts=jax.device_put(take(staged.counts), rep),
        sizes=jax.device_put(take(staged.sizes), rep),
    )
    return data, n_use // ndev, (hs, ws)


class EpochSpec(NamedTuple):
    """Static dataset/augmentation facts the epoch programs close over."""

    num_classes: int
    out_size: tuple[int, int]
    drift_prob: float
    flip_prob: float
    rgb_mean: tuple[float, float, float]
    rgb_std: tuple[float, float, float]
    match_iou: float = 0.0  # multi-positive matching threshold (0 = off)
    erase_prob: float = 0.0  # random-erasing occlusion augmentation


def _prep_batch(data: DeviceData, gather_images, idx_local, offsets, key,
                task: TaskSpec, spec: EpochSpec, anchors_xywh, anchors_xyxy,
                img_hw: tuple[int, int], train: bool):
    """Gather + augment + whiten + encode one batch fully on device.

    ``idx_local``: (ndev, b_loc) per-device indices into the local image
    shard; ``offsets``: (ndev, 1) global base index of each shard.
    """
    hs, ws = img_hw
    images_raw = gather_images(data.images, idx_local)  # (B, Hs*Ws*3) u8
    images_raw = images_raw.reshape(-1, hs, ws, 3)
    gidx = (idx_local + offsets).reshape(-1)            # (B,) global
    boxes = data.boxes[gidx]
    class_ids = data.class_ids[gidx]
    counts = data.counts[gidx]
    sizes = data.sizes[gidx]

    if train:
        if spec.erase_prob > 0.0:
            # split only when enabled so erase-off runs keep the exact
            # RNG stream of earlier recipes (bitwise replayability)
            key, k_on, k_rect = jax.random.split(key, 3)
        aug = sample_aug_params(
            key, boxes, counts, sizes, spec.drift_prob, spec.flip_prob
        )
    else:
        b = gidx.shape[0]
        aug = {
            "dy": jnp.zeros((b,), jnp.int32),
            "dx": jnp.zeros((b,), jnp.int32),
            "flip": jnp.zeros((b,), bool),
        }

    mean = jnp.asarray(spec.rgb_mean, jnp.float32)
    std = jnp.asarray(spec.rgb_std, jnp.float32)
    images = warp_batch(images_raw, sizes, aug, spec.out_size, pad_value=mean)
    if train and spec.erase_prob > 0.0:
        b = images.shape[0]
        on = jax.random.uniform(k_on, (b,)) < spec.erase_prob
        erase = sample_erase_params(k_rect, b, spec.out_size)
        images = apply_erase(images, erase, on, mean)
    images = (images - mean) / std

    tboxes = transform_boxes(boxes, sizes, aug, spec.out_size)
    gt = jax.vmap(
        lambda c, bx, n: encode_annotations_device(
            c, bx, n, anchors_xywh, anchors_xyxy, spec.num_classes,
            match_iou=spec.match_iou,
        )
    )(class_ids, tboxes, counts)
    return images, gt


def _make_gather(mesh):
    """shard_map'd per-device image-shard gather (the one op that must not
    fall into XLA's general gather lowering, which would all-gather the
    multi-GB operand)."""

    def gather(images_local, idx):
        return images_local[idx[lax.axis_index(DATA_AXIS)]]

    return shard_map(
        gather,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P()),
        out_specs=P(DATA_AXIS),
    )


def locate_sample(i: int, n_loc: int, b_loc: int) -> tuple[int, int]:
    """Map a GLOBAL sample index to its (step, batch_position) in the
    sequential val/predict epoch outputs.

    The epoch programs walk each device's local shard in order, so the
    stacked (steps, B, ...) outputs are device-major within a batch: global
    sample i lives on device d = i // n_loc at local offset l = i % n_loc,
    which device d processes at step l // b_loc in its slice of the batch
    (positions d*b_loc .. d*b_loc+b_loc-1). A naive divmod(i, batch_size)
    scrambles image identities whenever mesh.size > 1 and steps > 1 —
    found by the round-2 advisor, regression-tested in
    tests/test_device_data.py (identity + round-trip tests)."""
    d, l = divmod(i, n_loc)
    return l // b_loc, d * b_loc + l % b_loc


def _epoch_perm(key, ndev, n_loc, steps, b_loc):
    """(steps, ndev, b_loc) per-device local sample indices for one epoch."""
    perm = jax.vmap(lambda k: jax.random.permutation(k, n_loc))(
        jax.random.split(key, ndev)
    )  # (ndev, n_loc)
    return (
        perm[:, : steps * b_loc]
        .reshape(ndev, steps, b_loc)
        .transpose(1, 0, 2)
        .astype(jnp.int32)
    )


def make_train_epoch(task: TaskSpec, spec: EpochSpec, mesh, anchors_np,
                     n_loc: int, batch_size: int, img_hw: tuple[int, int]):
    """One dispatch = one training epoch (steps = n_loc*ndev // batch).

    Returns ``train_epoch(state, data, lr, key) -> (state, stats)`` with
    each stats value shaped (steps,). Dropout keys keep folding in
    ``state.step`` exactly as the per-batch path (parallel/train.py), so a
    device-data epoch is step-for-step equivalent to the host-loader path
    fed the same batches and augmentation draws.
    """
    tx = make_optimizer(task)
    ndev = mesh.size
    b_loc = batch_size // ndev
    steps = (n_loc * ndev) // batch_size
    gather_images = _make_gather(mesh)
    anchors_xywh = jnp.asarray(anchors_np, jnp.float32)
    anchors_xyxy = xywh_to_xyxy(anchors_xywh)
    offsets_np = (np.arange(ndev) * n_loc)[:, None].astype(np.int32)

    @partial(jax.jit, donate_argnums=(0,))
    def train_epoch(state, data: DeviceData, lr, key):
        perm_key, aug_key, step_rng = jax.random.split(key, 3)
        perm = _epoch_perm(perm_key, ndev, n_loc, steps, b_loc)
        offsets = jnp.asarray(offsets_np)

        def body(state, xs):
            step, idx_local = xs
            images, gt = _prep_batch(
                data, gather_images, idx_local, offsets,
                jax.random.fold_in(aug_key, step),
                task, spec, anchors_xywh, anchors_xyxy, img_hw, train=True,
            )
            return _sgd_step(
                state, images, gt, anchors_xywh, lr, step_rng, task, tx, None
            )

        return lax.scan(body, state, (jnp.arange(steps), perm))

    return train_epoch, steps


def make_val_epoch(task: TaskSpec, spec: EpochSpec, mesh, anchors_np,
                   n_loc: int, batch_size: int, img_hw: tuple[int, int],
                   n_valid: int | None = None):
    """One dispatch = full val-loss sweep (sequential batches, no aug).
    Stage val data with ``put_device_data(..., pad_to_batch=batch_size)``
    so n_loc is a multiple of b_loc and every sample is covered.

    ``n_valid``: number of REAL samples (before wrap-around padding).
    Padded slots (global padded-array index >= n_valid) get weight 0 in
    each step's loss mean, and the per-step stats include ``num_valid`` so
    callers can weight the epoch mean — without it, wrap padding would
    double-count the head of the val set in the reported loss."""
    ndev = mesh.size
    b_loc = batch_size // ndev
    steps = (n_loc * ndev) // batch_size
    gather_images = _make_gather(mesh)
    anchors_xywh = jnp.asarray(anchors_np, jnp.float32)
    anchors_xyxy = xywh_to_xyxy(anchors_xywh)
    offsets_np = (np.arange(ndev) * n_loc)[:, None].astype(np.int32)
    idx_all = np.arange(steps * b_loc, dtype=np.int32).reshape(steps, 1, b_loc)
    idx_all = np.broadcast_to(idx_all, (steps, ndev, b_loc)).copy()

    @jax.jit
    def val_epoch(params, data: DeviceData):
        offsets = jnp.asarray(offsets_np)

        def body(_, idx_local):
            images, gt = _prep_batch(
                data, gather_images, idx_local, offsets, None,
                task, spec, anchors_xywh, anchors_xyxy, img_hw, train=False,
            )
            gidx = (idx_local + offsets).reshape(-1)
            w = (
                (gidx < n_valid).astype(jnp.float32)
                if n_valid is not None
                else jnp.ones(gidx.shape, jnp.float32)
            )
            _, stats = _loss_for_batch(
                params, images, gt, anchors_xywh, task, None, False, None,
                sample_weights=w,
            )
            stats = dict(stats, num_valid=w.sum())
            return None, stats

        _, stats = lax.scan(body, None, jnp.asarray(idx_all))
        return stats

    return val_epoch, steps


def make_predict_epoch(task: TaskSpec, spec: EpochSpec, mesh,
                       anchors_np, n_loc: int, batch_size: int,
                       img_hw: tuple[int, int], tta_flip: bool = False):
    """One dispatch = detections for the whole resident val set: resize-only
    preprocessing then forward + on-device postprocess; returns fixed-shape
    {boxes, scores, class_ids, keep} stacked to (steps, B, K, ...).
    ``tta_flip`` swaps in the flip-TTA batch (parallel/train.py:
    _predict_batch_tta) so --device_data eval honors --tta_flip."""
    from squeezedet_tpu.parallel.train import _predict_batch_tta

    batch_fn = _predict_batch_tta if tta_flip else _predict_batch
    ndev = mesh.size
    b_loc = batch_size // ndev
    steps = (n_loc * ndev) // batch_size
    gather_images = _make_gather(mesh)
    anchors_xywh = jnp.asarray(anchors_np, jnp.float32)
    anchors_xyxy = xywh_to_xyxy(anchors_xywh)
    offsets_np = (np.arange(ndev) * n_loc)[:, None].astype(np.int32)
    idx_all = np.arange(steps * b_loc, dtype=np.int32).reshape(steps, 1, b_loc)
    idx_all = np.broadcast_to(idx_all, (steps, ndev, b_loc)).copy()

    @jax.jit
    def predict_epoch(params, data: DeviceData):
        offsets = jnp.asarray(offsets_np)

        def body(_, idx_local):
            images_raw = gather_images(data.images, idx_local)
            images_raw = images_raw.reshape(-1, *img_hw, 3)
            gidx = (idx_local + offsets).reshape(-1)
            sizes = data.sizes[gidx]
            b = gidx.shape[0]
            aug = {
                "dy": jnp.zeros((b,), jnp.int32),
                "dx": jnp.zeros((b,), jnp.int32),
                "flip": jnp.zeros((b,), bool),
            }
            mean = jnp.asarray(spec.rgb_mean, jnp.float32)
            std = jnp.asarray(spec.rgb_std, jnp.float32)
            images = warp_batch(
                images_raw, sizes, aug, spec.out_size, pad_value=mean
            )
            images = (images - mean) / std
            return None, batch_fn(params, images, anchors_xywh, task)

        _, dets = lax.scan(body, None, jnp.asarray(idx_all))
        return dets

    return predict_epoch, steps
