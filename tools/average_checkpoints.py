"""Average the params of several checkpoints (SWA-style tail averaging).

Averaging the last few interval checkpoints of a finished run is a
zero-training-cost way to squeeze extra mAP out of an SGD trajectory
(Izmailov et al., "Averaging Weights Leads to Wider Optima"). The
reference has no equivalent — its checkpoints are terminal artifacts
(reference src/utils/model.py:64-71); here the averaged tree is written
as a normal orbax params checkpoint, so every downstream consumer
(``--load_model`` eval/demo, StableHLO export, reference-format .pth
export) works on it unchanged.

Usage:

    python tools/average_checkpoints.py --out exp/run/model_swa \
        exp/run/model_240 exp/run/model_260 exp/run/model_280 \
        exp/run/model_300

Inputs must be native orbax params checkpoints (the ``model_*`` dirs
written by training). The tool refuses trees whose structures or leaf
shapes disagree — averaging across architectures is a bug, not a merge.
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _restore_raw(path: str) -> dict:
    """Template-free orbax restore of a params checkpoint dir."""
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer().restore(os.path.abspath(path))


def average_params(trees: list) -> dict:
    """Leaf-wise fp32 mean of structurally identical param pytrees."""
    ref_def = jax.tree.structure(trees[0])
    for i, t in enumerate(trees[1:], 1):
        if jax.tree.structure(t) != ref_def:
            raise SystemExit(
                f"checkpoint #{i} has a different tree structure — "
                "are these from the same architecture?"
            )
    ref_leaves = jax.tree.leaves(trees[0])
    for i, t in enumerate(trees[1:], 1):
        for a, b in zip(ref_leaves, jax.tree.leaves(t)):
            if np.shape(a) != np.shape(b):
                raise SystemExit(
                    f"checkpoint #{i} has a leaf of shape {np.shape(b)} "
                    f"where #0 has {np.shape(a)} — refusing to average."
                )
    n = len(trees)
    return jax.tree.map(
        lambda *leaves: (
            sum(np.asarray(l, np.float64) for l in leaves) / n
        ).astype(np.float32),
        *trees,
    )


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument(
        "checkpoints", nargs="+",
        help="two or more orbax params checkpoint dirs (model_* from training)",
    )
    ap.add_argument("--out", required=True, help="output checkpoint dir")
    args = ap.parse_args(argv)
    if len(args.checkpoints) < 2:
        raise SystemExit("need at least two checkpoints to average")

    # host-side tool: never claim (or require) the TPU. The env pins
    # JAX_PLATFORMS=axon at interpreter start, so flip via jax.config.
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass  # backend already initialized (e.g. called from tests)

    from squeezedet_tpu.utils.checkpoint import save_params

    restored = [_restore_raw(p) for p in args.checkpoints]
    for p, r in zip(args.checkpoints, restored):
        if "params" not in r:
            raise SystemExit(f"{p}: not a params checkpoint (no 'params' key)")
    avg = average_params([r["params"] for r in restored])
    epoch = max(int(r.get("epoch", 0)) for r in restored)
    save_params(args.out, avg, epoch)
    print(
        f"averaged {len(restored)} checkpoints -> {args.out} "
        f"(epoch tag {epoch})"
    )


if __name__ == "__main__":
    main()
