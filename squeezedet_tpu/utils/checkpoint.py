"""Checkpoint IO: orbax train-state checkpoints + PyTorch .pth conversion.

Two formats:

1. **Native (orbax)**: full train state — params, optimizer state, step,
   epoch — enabling true resume, which the reference lacks (it saves only
   ``{'epoch', 'state_dict'}`` and always restarts at epoch 1,
   src/utils/model.py:64-71, src/train.py:56).
2. **PyTorch ``.pth``** (read-only): one-way converter for the reference's
   checkpoints — both its own training checkpoints (``state_dict`` with an
   optional DataParallel ``module.`` prefix, src/utils/model.py:5-41) and
   the official torchvision SqueezeNet ImageNet files (bare ``features.*``
   keys, src/utils/model.py:43-61). Conv weights are transposed
   OIHW -> HWIO for the NHWC model. Loading is tolerant: mismatched /
   missing / extra tensors warn and keep the fresh initialization.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

from squeezedet_tpu.models.squeezedet import (
    ModelSpec,
    Params,
    torch_feature_indices,
)

# -- native orbax checkpoints ------------------------------------------------


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_train_state(path: str, state, epoch: int, best: float | None = None) -> None:
    """Save the full train state (params + optimizer + step + epoch), plus
    the running best-metric value so --resume never demotes model_best."""
    path = os.path.abspath(path)
    payload = {
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(state.step),
        "epoch": int(epoch),
    }
    if best is not None:
        payload["best"] = float(best)
    if getattr(state, "ema", None) is not None:
        payload["ema"] = jax.device_get(state.ema)
    _checkpointer().save(path, payload, force=True)


def load_train_state(path: str, template_state):
    """Restore into the structure of ``template_state``; returns
    (TrainState, epoch, best) — best is None for checkpoints saved
    without it."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = _checkpointer()
    # 'best' and 'ema' are optional leaves, and orbax requires the restore
    # item to match the on-disk tree EXACTLY (extra or missing top-level
    # keys both raise) — so read the stored key set first and build the
    # one matching item
    top = set(ckpt.metadata(path).item_metadata.tree.keys())
    item: dict = {
        "params": jax.device_get(template_state.params),
        "opt_state": jax.device_get(template_state.opt_state),
        "step": 0,
        "epoch": 0,
    }
    if "best" in top:
        item["best"] = 0.0
    if "ema" in top:
        # params-shaped template whether or not this run keeps the EMA
        item["ema"] = jax.device_get(
            template_state.ema
            if getattr(template_state, "ema", None) is not None
            else template_state.params
        )
    restored = ckpt.restore(path, args=ocp.args.PyTreeRestore(item=item))
    best = float(restored["best"]) if "best" in restored else None
    want_ema = getattr(template_state, "ema", None) is not None
    ema = restored.get("ema") if want_ema else None
    if want_ema and ema is None:
        # resuming a pre-ema run with --ema_decay on: seed from params
        print("[checkpoint] no EMA in checkpoint — seeding EMA from params")
        ema = jax.tree.map(np.array, restored["params"])
    state = type(template_state)(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=np.int32(restored["step"]),
        ema=ema,
    )
    return state, int(restored["epoch"]), best


def save_params(path: str, params: Params, epoch: int = 0) -> None:
    """Save a params-only checkpoint (the analog of the reference's
    state_dict files)."""
    _checkpointer().save(
        os.path.abspath(path),
        {"params": jax.device_get(params), "epoch": int(epoch)},
        force=True,
    )


def load_params(path: str, template: Params) -> tuple[Params, int]:
    import orbax.checkpoint as ocp

    restored = _checkpointer().restore(
        os.path.abspath(path),
        args=ocp.args.PyTreeRestore(
            item={"params": jax.device_get(template), "epoch": 0}
        ),
    )
    return restored["params"], int(restored["epoch"])


# -- PyTorch .pth conversion -------------------------------------------------


def _torch_key_map(spec: ModelSpec) -> dict[tuple[str, ...], str]:
    """Our param-tree paths -> reference state-dict key stems."""
    feat = torch_feature_indices(spec.arch)
    mapping: dict[tuple[str, ...], str] = {
        ("stem",): f"base.features.{feat['stem']}",
        ("convdet",): "base.convdet",
    }
    i = 0
    while f"fire{i}" in feat:
        idx = feat[f"fire{i}"]
        mapping[(f"fire{i}", "squeeze")] = f"base.features.{idx}.squeeze"
        mapping[(f"fire{i}", "expand1")] = f"base.features.{idx}.expand1x1"
        mapping[(f"fire{i}", "expand3")] = f"base.features.{idx}.expand3x3"
        i += 1
    return mapping


def _normalize_torch_keys(state_dict: dict[str, Any]) -> dict[str, Any]:
    """Strip DataParallel 'module.' prefixes; prepend 'base.' to bare
    torchvision keys ('features.*', official ImageNet files)."""
    out = {}
    for k, v in state_dict.items():
        if k.startswith("module.") and not k.startswith("module_list"):
            k = k[7:]
        if k.startswith("features.") or k.startswith("classifier."):
            k = "base." + k
        out[k] = v
    return out


def _read_pth_state_dict(model_path: str) -> tuple[dict[str, np.ndarray], int]:
    """Load + normalize a .pth into a numpy state dict, caching the result
    next to the source as ``<file>_converted.npz`` so repeat loads skip
    torch entirely (the analog of the reference's ``*_converted.pth`` cache,
    src/utils/model.py:55-61)."""
    cache = model_path + "_converted.npz"
    if (
        os.path.exists(cache)
        and os.path.getmtime(cache) >= os.path.getmtime(model_path)
    ):
        with np.load(cache) as z:
            epoch = int(z["__epoch__"])
            return {k: z[k] for k in z.files if k != "__epoch__"}, epoch

    import torch

    blob = torch.load(model_path, map_location="cpu", weights_only=True)
    if isinstance(blob, dict) and "state_dict" in blob:
        epoch = int(blob.get("epoch", 0))
        state_dict = blob["state_dict"]
    else:  # raw state dict (official torchvision files)
        epoch = 0
        state_dict = blob

    state_dict = _normalize_torch_keys(
        {k: np.asarray(v) for k, v in state_dict.items()}
    )
    try:  # best-effort cache; a read-only checkpoint dir is fine
        tmp = cache + ".tmp.npz"  # .npz suffix keeps np.savez from renaming
        np.savez(tmp, __epoch__=np.int64(epoch), **state_dict)
        os.replace(tmp, cache)
    except OSError:
        pass
    return state_dict, epoch


def load_pth_params(
    model_path: str,
    init: Params,
    spec: ModelSpec,
    verbose: bool = True,
) -> tuple[Params, int]:
    """Convert a reference/torchvision .pth into our params pytree.

    Returns (params, epoch). Tensors that are absent or shape-mismatched
    keep their values from ``init`` (tolerant-load semantics of the
    reference, src/utils/model.py:19-38).
    """
    state_dict, epoch = _read_pth_state_dict(model_path)
    key_map = _torch_key_map(spec)

    params = jax.tree.map(np.asarray, init)
    used = set()
    problems = []

    for path, stem in key_map.items():
        node = params
        for p in path[:-1] if len(path) > 1 else ():
            node = node[p]
        leaf = node[path[-1]] if len(path) > 1 else params[path[-1]]

        for ours, theirs in (("w", "weight"), ("b", "bias")):
            torch_key = f"{stem}.{theirs}"
            used.add(torch_key)
            if torch_key not in state_dict:
                problems.append(f"missing in checkpoint: {torch_key}")
                continue
            value = state_dict[torch_key].astype(np.float32)
            if ours == "w":
                value = value.transpose(2, 3, 1, 0)  # OIHW -> HWIO
            if value.shape != leaf[ours].shape:
                problems.append(
                    f"shape mismatch {torch_key}: ckpt {value.shape} "
                    f"vs model {leaf[ours].shape} — keeping init"
                )
                continue
            leaf[ours] = value

    extra = [
        k for k in state_dict
        if k not in used and not k.startswith(("base.classifier",))
    ]
    for k in extra:
        problems.append(f"unused checkpoint tensor: {k}")

    if verbose:
        for msg in problems:
            print(f"[checkpoint] {msg}")
        status = "fully" if not problems else "partially"
        print(f"[checkpoint] {model_path} loaded {status} (epoch {epoch})")

    return params, epoch


def save_pth_params(
    path: str, params: Params, spec: ModelSpec, epoch: int = 0
) -> None:
    """Export detection params as a reference-format ``.pth`` checkpoint —
    the INVERSE of :func:`load_pth_params`, completing two-way interop:
    models trained here load into the reference with its own
    ``load_model`` (reference src/utils/model.py:5-41; its save format
    ``{'epoch', 'state_dict'}`` with ``base.features.{i}.*`` /
    ``base.convdet.*`` keys is src/utils/model.py:64-71). Weights are
    transposed HWIO -> OIHW. Round-trip equality is asserted in
    tests/test_checkpoint.py."""
    import torch

    state_dict: dict[str, Any] = {}
    for tree_path, stem in _torch_key_map(spec).items():
        node = params
        for p in tree_path:
            node = node[p]
        w = np.asarray(node["w"], np.float32).transpose(3, 2, 0, 1)
        state_dict[f"{stem}.weight"] = torch.from_numpy(np.ascontiguousarray(w))
        state_dict[f"{stem}.bias"] = torch.from_numpy(
            np.asarray(node["b"], np.float32).copy()
        )
    torch.save({"epoch": int(epoch), "state_dict": state_dict}, path)


def load_any(path: str, init: Params, spec: ModelSpec) -> tuple[Params, int]:
    """Dispatch on checkpoint format: .pth file vs orbax directory."""
    if path.endswith(".pth"):
        return load_pth_params(path, init, spec)
    return load_params(path, init)
