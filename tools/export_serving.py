#!/usr/bin/env python
"""Export a trained detector to a StableHLO serving artifact.

Bakes the checkpoint into a single serialized function (uint8 batch ->
fixed-shape detections, the default serving path incl. on-device NMS) that
any StableHLO consumer can run without Python or this framework. See
squeezedet_tpu/utils/export.py.

Usage:
    python tools/export_serving.py exp/my_run/model_best out/serving \
        [--dataset kitti] [--batch_size 20] [--float_input] [--arch ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("checkpoint", help=".pth or orbax checkpoint")
    ap.add_argument("out_prefix", help="writes <prefix>.stablehlo + .json")
    ap.add_argument("--dataset", default="kitti", choices=["kitti", "coco"])
    ap.add_argument("--arch", default="squeezedet",
                    choices=["squeezedet", "squeezedetplus"])
    ap.add_argument("--batch_size", type=int, default=20)
    ap.add_argument("--data_dir", default="",
                    help="dataset root for constants (default: <repo>/data)")
    ap.add_argument("--float_input", action="store_true",
                    help="export the pre-whitened float path instead of uint8")
    ap.add_argument("--platforms", default="",
                    help="comma-separated lowering targets (e.g. 'tpu' to "
                         "cross-compile from a CPU host); default = current "
                         "backend")
    ap.add_argument("--data_parallel", type=int, default=0,
                    help="export the mesh-sharded serving step over N "
                         "devices (batch dim sharded, weights replicated); "
                         "deserialize+call then requires N devices")
    args = ap.parse_args(argv)

    import jax

    from squeezedet_tpu.config import Config
    from squeezedet_tpu.models.squeezedet import init_params
    from squeezedet_tpu.train import build_task
    from squeezedet_tpu.utils.checkpoint import load_any
    from squeezedet_tpu.utils.export import export_stablehlo
    from squeezedet_tpu.utils.misc import load_dataset

    cfg = Config(
        mode="eval", dataset=args.dataset, arch=args.arch,
        data_dir=args.data_dir,
    )
    cfg.finalize_dirs()
    # the dataset is constructed only for its constants (input size /
    # anchors / rgb stats / class names), same as the eval driver
    try:
        dataset = load_dataset(args.dataset)("val", cfg)
    except FileNotFoundError as e:
        raise SystemExit(
            f"export needs the dataset constants (anchors/rgb stats): point "
            f"--data_dir at any {args.dataset} tree ({e})"
        )
    cfg.update_dataset_info(dataset)

    task = build_task(cfg)
    params = init_params(jax.random.PRNGKey(0), task.model)
    params, epoch = load_any(args.checkpoint, params, task.model)

    os.makedirs(os.path.dirname(os.path.abspath(args.out_prefix)), exist_ok=True)
    path = export_stablehlo(
        args.out_prefix, params, task, cfg, args.batch_size,
        uint8=not args.float_input,
        platforms=args.platforms.split(",") if args.platforms else None,
        data_parallel=args.data_parallel,
    )
    size = os.path.getsize(path)
    print(
        f"exported {args.checkpoint} (epoch {epoch}) -> {path} "
        f"({size / 1e6:.1f} MB, batch {args.batch_size})"
    )


if __name__ == "__main__":
    main()
