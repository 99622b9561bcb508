#!/usr/bin/env python
"""Export an orbax detection checkpoint to a reference-format ``.pth``.

Completes two-way interop with the reference: its ``load_model``
(reference src/utils/model.py:5-41) consumes the output directly, so a
model trained by this framework can be served/evaluated by the reference
PyTorch stack. The inverse direction (.pth -> here) is
``--load_model foo.pth``.

Usage:
    python tools/export_reference_pth.py exp/my_run/model_best out.pth \
        [--arch squeezedet] [--num_classes 3] [--anchors_per_grid 9]
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from squeezedet_tpu.models.squeezedet import ModelSpec, init_params  # noqa: E402
from squeezedet_tpu.utils.checkpoint import load_params, save_pth_params  # noqa: E402


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("checkpoint", help="orbax params checkpoint dir")
    ap.add_argument("out", help="output .pth path")
    ap.add_argument("--arch", default="squeezedet",
                    choices=["squeezedet", "squeezedetplus"])
    ap.add_argument("--num_classes", type=int, default=3)
    ap.add_argument("--anchors_per_grid", type=int, default=9)
    args = ap.parse_args(argv)

    spec = ModelSpec(
        arch=args.arch,
        num_classes=args.num_classes,
        anchors_per_grid=args.anchors_per_grid,
    )
    template = jax.tree.map(
        np.asarray, init_params(jax.random.PRNGKey(0), spec)
    )
    params, epoch = load_params(args.checkpoint, template)
    save_pth_params(args.out, params, spec, epoch)
    n = sum(int(np.prod(np.asarray(p).shape)) for p in jax.tree.leaves(params))
    print(f"exported {args.checkpoint} (epoch {epoch}, {n:,} params) -> {args.out}")


if __name__ == "__main__":
    main()
