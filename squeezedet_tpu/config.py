"""Configuration: a typed dataclass + a flag-compatible argparse front-end.

Covers the reference's ~30 flags (src/utils/config.py:9-85) with the same
names and defaults so command lines port 1:1, plus TPU-specific knobs
(mixed precision, mesh/data-parallel size, prefetch depth, profiling).

Derived fields (`parse`): experiment dirs, per-device batch divisibility
(the TPU analog of the reference's per-GPU chunk sizes,
src/utils/config.py:102-111 — SPMD batch sharding requires equal shards,
so we validate divisibility instead of supporting uneven chunks).
`update_dataset_info` copies dataset constants into the config so the model
layer stays dataset-agnostic (src/utils/config.py:121-131).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
from dataclasses import dataclass, field
from typing import Any

import numpy as np


@dataclass
class Config:
    # basic experiment settings
    mode: str = "train"  # train | eval | demo
    dataset: str = "kitti"  # kitti | coco
    load_model: str = ""  # path to pre-trained ckpt (.pth or orbax dir)
    debug: int = 0  # 1: dump preprocessed GT vis; 2: dump detection vis
    exp_id: str = "default"

    # model
    arch: str = "squeezedet"  # squeezedet | squeezedetplus
    dropout_prob: float = 0.5
    init_scheme: str = "reference"  # reference | he (from-scratch training)

    # train
    lr: float = 0.01
    lr_schedule: str = "step"  # step (reference StepLR) | cosine | constant
    lr_step_size: int = 60  # step schedule: epochs per decay (ref: 60)
    lr_gamma: float = 0.5  # step schedule: decay factor (ref: 0.5)
    warmup_epochs: int = 0  # linear lr ramp over the first N epochs
    min_lr: float = 0.0  # cosine schedule floor (reached at the final epoch)
    ema_decay: float = 0.0  # EMA of params; 0 = off, 0.999-0.9999 typical
    momentum: float = 0.9
    weight_decay: float = 0.0001
    grad_norm: float = 5.0
    num_epochs: int = 300
    num_iters: int = -1
    batch_size: int = 20
    save_intervals: int = 1
    val_intervals: int = 5
    no_eval: bool = False
    print_interval: int = 10
    flip_prob: float = 0.5
    drift_prob: float = 1.0
    erase_prob: float = 0.0  # random-erasing occlusion augmentation
    #   (Zhong et al. 2017): with this probability, fill one random rect
    #   (2-20% of the image) with the dataset mean, keeping full-extent GT
    #   labels — trains amodal prediction from partial evidence. No
    #   reference counterpart; see EVIDENCE.md round 3 (occ-2 plateau).
    forbid_resize: bool = False
    class_loss_weight: float = 1.0
    positive_score_loss_weight: float = 3.75
    negative_score_loss_weight: float = 100.0
    bbox_loss_weight: float = 6.0
    bbox_loss: str = "l2"  # l2 (reference parity) | ciou|diou|giou | l2+<iou> hybrid
    bbox_iou_mix: float = 0.5  # IoU-element weight in the l2+<iou> hybrid kinds
    #   (Complete-IoU on decoded boxes, Zheng et al. 2020 — targets
    #   localization quality directly; built for the occ-2 cohort stuck
    #   at IoU [0.5, 0.7) under the devkit's 0.7 car gate, EVIDENCE r4)
    match_iou: float = 0.0  # >0 = SSD-style multi-positive anchor matching:
    #   anchors with IoU >= thresh become extra positives for their best GT
    #   on top of the reference's one-anchor-per-GT assignment (0 = exact
    #   reference parity). Remedy for crowded/occluded-object recall —
    #   see EVIDENCE.md round 3 (occ-2 plateau is assignment starvation).
    resume: str = ""  # orbax checkpoint dir to resume full train state from
    anchor_seeds_file: str = ""  # override the dataset's built-in k-means
    #   anchor seeds with a (K, 2) whitespace table of (w, h) pixels —
    #   written by tools/compute_dataset_seed_anchors.py. The head width
    #   follows K automatically. Refit when the deployment's box-shape
    #   statistics differ from the dataset defaults (the KITTI seeds are
    #   real-KITTI k-means, reference src/datasets/kitti.py:27-29).

    # inference
    nms_thresh: float = 0.4
    score_thresh: float = 0.3
    keep_top_k: int = 64
    nms_method: str = "hard"  # hard (reference parity) | soft_linear |
    #   soft_gauss — Soft-NMS score decay (ops/postprocess.soft_nms_rescore)
    soft_nms_sigma: float = 0.5  # gaussian decay width for soft_gauss
    tta_flip: bool = False  # flip test-time augmentation: run each batch
    #   and its horizontal mirror through the forward pass in one dispatch,
    #   merge through NMS (ops/postprocess.py:postprocess_tta_flip).
    #   ~2x forward FLOPs per image; no reference counterpart.
    allow_random_weights: bool = False  # let `eval` run without --load_model
    #   (otherwise it refuses: scoring fresh random weights yields a
    #   plausible-looking mAP~0 run that hides the typo)

    # system / TPU
    num_workers: int = 4  # host-side loader threads
    seed: int = 42
    # reference-CLI compatibility (accepted, not meaningful on TPU):
    # device selection is the mesh; SPMD shards the batch evenly, so uneven
    # master chunks don't exist; there is no cudnn autotuner.
    gpus: str = "0"
    master_batch_size: int = -1
    not_cuda_benchmark: bool = False
    mixed_precision: bool = False  # bf16 compute in the backbone
    data_parallel: int = 0  # 0 = all visible devices
    model_parallel: int = 1  # tensor (channel) parallelism: shard every
    #   fire's squeeze/expand channels over a second mesh axis (Megatron
    #   column/row plan, parallel/tensor.py). Total devices used =
    #   data_parallel x model_parallel. 1 disables. Host-loader path only
    #   (--device_data keeps its own data-parallel epoch program).
    grad_accum: int = 1  # gradient accumulation: split each batch into N
    #   sequential microbatch backwards and update once on the mean grad —
    #   train effective batches that don't fit in HBM. 1 disables.
    remat: bool = False  # rematerialise fire activations in the backward
    #   (jax.checkpoint): ~1.3x backbone FLOPs for a large activation-
    #   memory cut; numerically identical. Combine with --grad_accum for
    #   the biggest effective batches.
    prefetch: int = 2  # device prefetch depth
    steps_per_dispatch: int = 4  # train steps fused into one dispatch via
    #   lax.scan — amortizes the host->device dispatch round-trip (≈28 ms
    #   through the TPU tunnel) over k optimizer steps; numerically
    #   identical to k single dispatches. 1 disables.
    profile_dir: str = ""  # jax.profiler trace output ('' = off)
    native_loader: bool = True  # use the C++ image loader when built
    dispatch_timeout_s: float = 600.0  # device-data mode: fail loudly if a
    #   per-epoch device readback stalls this long (wedged relay RPC —
    #   observed in production; resume with --resume <save_dir>/state_last).
    #   0 disables the watchdog.
    serve_int8: bool = False  # int8 PTQ serving (models/quant.py): absmax
    #   calibration on the first batch, s8xs8->s32 convs on the MXU
    serve_uint8: bool = True  # DEFAULT serving path: ship raw uint8
    #   batches; whitening folded into the stem conv on device (4x less H2D
    #   traffic; measured faster every round — round-2: 1,646 vs 1,585
    #   img/s). --no_serve_uint8 restores host-whitened float input (the
    #   bit-parity path used by the oracle tests).
    cache_images: bool = True  # keep decoded images in RAM (uint8) so each
    #   epoch after the first skips PNG decode (KITTI ~5GB; host has 125GB)
    device_data: bool = False  # stage the whole dataset in HBM and run one
    #   jitted dispatch per epoch (gather + augment + GT-encode + step all
    #   on device; parallel/epoch.py). Needs the uint8 dataset to fit in
    #   device memory (KITTI: ~6.3 GB train+val on a 16 GB v5e). Immune to
    #   host speed and tunnel RTT/bandwidth pathologies.
    fast_pipeline: bool = False  # train-time host pipeline stays uint8
    #   (aug + resize on raw bytes, whitening fused on device); trades
    #   sub-LSB quantization noise for ~3x less host work and 4x less H2D
    max_objects: int = 0  # device_data GT capacity per frame; 0 = auto-size
    #   from the dataset's observed per-frame maximum (min 16)
    port: int = 8080  # serve mode: HTTP listen port
    max_wait_ms: float = 15.0  # serve mode: dynamic-batching window — how
    #   long the collector waits after the first request for the batch to
    #   fill before dispatching a padded batch
    num_fires: int = 0  # pretrain trunk depth (fire modules); 0 = arch
    #   default: 8 on squeezedet (the torchvision squeezenet1_1 prefix),
    #   every fire on squeezedetplus (its ImageNet backbone covers them all)

    # derived (filled by parse/update_dataset_info)
    root_dir: str = ""
    data_dir: str = ""
    exp_dir: str = ""
    save_dir: str = ""
    debug_dir: str = ""
    input_size: tuple = (384, 1248)
    rgb_mean: Any = None
    rgb_std: Any = None
    class_names: tuple = ()
    num_classes: int = 0
    anchors: Any = None
    anchors_per_grid: int = 0
    num_anchors: int = 0

    def finalize_dirs(self, root_dir: str | None = None) -> "Config":
        self.root_dir = root_dir or os.path.abspath(
            os.path.join(os.path.dirname(__file__), "..")
        )
        self.data_dir = self.data_dir or os.path.join(self.root_dir, "data")
        self.exp_dir = os.path.join(self.root_dir, "exp")
        self.save_dir = os.path.join(self.exp_dir, self.exp_id)
        self.debug_dir = os.path.join(self.save_dir, "debug")
        return self

    def update_dataset_info(self, dataset) -> "Config":
        """Copy dataset constants into the config (input size, rgb stats,
        class names, anchor grid) so the model layer never imports datasets."""
        self.input_size = dataset.input_size
        self.rgb_mean = dataset.rgb_mean
        self.rgb_std = dataset.rgb_std
        self.class_names = dataset.class_names
        self.num_classes = dataset.num_classes
        self.anchors = dataset.anchors
        self.anchors_per_grid = dataset.anchors_per_grid
        self.num_anchors = dataset.num_anchors
        # protocol-appropriate serving threshold: COCO AP integrates the
        # full PR curve, so the KITTI-style default 0.3 would cut the
        # low-recall tail and depress AP; a dataset may declare its own
        # default, applied only when the user left the config default
        ds_thresh = getattr(dataset, "default_score_thresh", None)
        field_default = type(self).__dataclass_fields__["score_thresh"].default
        # "left at default" must mean the flag was not on the command line —
        # an explicit `--score_thresh 0.3` equals the dataclass default but
        # is still the user's chosen operating point (parse() records the
        # flags it saw; directly-constructed Configs fall back to the
        # value check)
        explicit = "score_thresh" in getattr(self, "_explicit_flags", frozenset())
        if (
            ds_thresh is not None
            and not explicit
            and self.score_thresh == field_default
        ):
            print(
                f"[config] score_thresh {self.score_thresh} -> {ds_thresh} "
                f"({type(dataset).__name__} protocol default; pass "
                "--score_thresh explicitly to override)"
            )
            self.score_thresh = ds_thresh
        return self

    def describe(self) -> str:
        lines = []
        for f in sorted(dataclasses.fields(self), key=lambda f: f.name):
            v = getattr(self, f.name)
            if isinstance(v, np.ndarray):
                v = f"ndarray{v.shape}"
            lines.append(f"{f.name:<30} {v}")
        return "\n".join(lines)


_FLAG_HELP = {
    "dataset": "coco | kitti",
    "load_model": "path to pre-trained model (.pth or orbax checkpoint dir)",
    "debug": "0: off | 1: visualize preprocessed GT | 2: visualize detections",
    "arch": "model architecture: squeezedet | squeezedetplus",
    "lr": "learning rate (reference default tuned for batch size 32)",
    "lr_schedule": "step (reference StepLR(60,.5)) | cosine | constant",
    "bbox_loss": "l2 (reference parity: delta-space L2) | ciou | diou | "
                 "giou (IoU-family losses on decoded boxes) | l2+ciou | "
                 "l2+diou | l2+giou (L2 unchanged + bbox_iou_mix x IoU term)",
    "bbox_iou_mix": "weight on the IoU element in the l2+<iou> hybrid "
                    "bbox losses (l2 part is never rescaled)",
    "warmup_epochs": "linear lr warmup over the first N epochs (0 = off)",
    "min_lr": "cosine schedule floor, reached at the final epoch",
    "ema_decay": "EMA of params; eval/model_best use the averaged weights "
                 "(0 = off)",
    "num_iters": "iterations per epoch; -1 = #samples/batch_size",
    "no_eval": "skip mAP evaluation during training",
    "forbid_resize": "use center crop/pad instead of resizing",
    "nms_thresh": "suppress boxes overlapping a kept box with IoU > thresh",
    "nms_method": "hard (reference parity) | soft_linear | soft_gauss "
                  "(Soft-NMS: decay overlapping scores instead of dropping)",
    "soft_nms_sigma": "gaussian decay width for --nms_method soft_gauss",
    "score_thresh": "discard detections scoring below this",
    "keep_top_k": "detections kept per image before NMS",
    "tta_flip": "merge detections from the image and its mirror (2x FLOPs)",
    "erase_prob": "random-erasing occlusion augmentation probability "
                  "(fills a 2-20%-area rect with the dataset mean; GT "
                  "boxes keep their full extent)",
    "mixed_precision": "bf16 backbone compute (fp32 master weights and loss)",
    "data_parallel": "number of devices for SPMD data parallelism (0 = all)",
    "model_parallel": "devices for tensor (channel) parallelism; 1 = off",
    "grad_accum": "microbatch backwards accumulated per optimizer step",
    "remat": "recompute fire activations in the backward to save HBM",
    "resume": "orbax train-state checkpoint to resume from (with optimizer)",
}


class _BoolFlag(argparse.Action):
    """Boolean flag with an explicit off switch: --x sets True, --no-x and
    --no_x set False (plain store_true made default-True flags like
    --cache_images impossible to disable from the CLI). Negatives are
    matched exactly, so the reference's literal --no_eval flag still means
    'set no_eval=True'."""

    def __init__(self, option_strings, dest, default=None, help=None, **kw):
        opts, self._negatives = [], set()
        for s in option_strings:
            negatives = ["--no-" + s[2:], "--no_" + s[2:]]
            opts += [s] + negatives
            self._negatives.update(negatives)
        super().__init__(opts, dest, nargs=0, default=default, help=help)

    def __call__(self, parser, namespace, values, option_string=None):
        setattr(namespace, self.dest, option_string not in self._negatives)

    def format_usage(self):
        return self.option_strings[0]


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="SqueezeDet-TPU")
    parser.add_argument(
        "mode", help="train | eval | demo | pretrain | serve | bench"
    )
    for f in dataclasses.fields(Config):
        if f.name == "mode" or f.name in (
            "root_dir", "exp_dir", "save_dir", "debug_dir",
            "input_size", "rgb_mean", "rgb_std", "class_names", "num_classes",
            "anchors", "anchors_per_grid", "num_anchors",
        ):
            continue
        if f.name == "data_dir":
            parser.add_argument(
                "--data_dir", type=str, default="",
                help="dataset root (default: <repo>/data)",
            )
            continue
        name = f"--{f.name}"
        help_text = _FLAG_HELP.get(f.name, "")
        if f.type == "bool" or isinstance(f.default, bool):
            parser.add_argument(
                name, action=_BoolFlag, default=f.default, help=help_text
            )
        else:
            parser.add_argument(
                name, type=type(f.default), default=f.default, help=help_text
            )
    return parser


def parse(argv: list[str] | None = None) -> Config:
    args = build_parser().parse_args(argv)
    cfg = Config(**vars(args))
    # remember which flags were explicitly on the command line (dataset
    # protocol defaults must not override an explicit user value even when
    # it coincides with the dataclass default)
    raw = sys.argv[1:] if argv is None else list(argv)
    explicit = set()
    for tok in raw:
        if tok.startswith("--"):
            name = tok[2:].split("=", 1)[0].replace("-", "_")
            explicit.add(name)
            if name.startswith("no_"):
                explicit.add(name[3:])  # _BoolFlag off switch
    cfg._explicit_flags = frozenset(explicit)
    if cfg.master_batch_size != -1:
        print(
            "[config] --master_batch_size is a no-op: SPMD shards the batch "
            "evenly across the mesh (see --data_parallel)"
        )
    cfg.finalize_dirs()
    return cfg
