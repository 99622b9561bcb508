"""SqueezeNet image classifier on the shared detection trunk.

Purpose: the reference's primary training mode is *fine-tuning* — it starts
from ImageNet SqueezeNet weights (reference src/utils/model.py:43-61 loads
the official torchvision ``squeezenet1_1`` state dict, src/demo.py:19 and
README "train" section assume a pretrained backbone). In this environment
the torchvision blobs are unobtainable (zero egress, verified — see
EVIDENCE.md "Blocked acquisitions"), so this module closes the gap from the
other side: it PRODUCES a pretrained backbone with the framework itself.

- The classifier trunk is the exact torchvision ``squeezenet1_1.features``
  topology (conv 3x3/s2 + ReLU + 3 ceil-mode pools + 8 fire modules,
  torchvision models/squeezenet.py v1.1 branch) — which is also the prefix
  of the detection backbone (``ARCH_SPECS['squeezedet']`` stem + fire0..7;
  reference src/model/squeezedet.py:33-49 appends two more fires and the
  ConvDet head on top of it).
- The classifier head mirrors torchvision's: dropout -> 1x1 conv ->
  ReLU -> global average pool.
- :func:`export_torchvision_pth` writes the trained weights as a *bare
  torchvision-format state dict* (``features.{i}.squeeze.weight``...,
  ``classifier.1.weight``) via ``torch.save`` — so fine-tuning consumes it
  through the REAL ImageNet-checkpoint code path
  (``utils/checkpoint.load_pth_params`` with key normalization and
  OIHW -> HWIO transposes), exercised with actually-trained weights
  rather than synthetic state dicts.

Round-trip + transfer are tested in tests/test_classifier.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from squeezedet_tpu.models.squeezedet import (
    ARCH_SPECS,
    Params,
    _conv,
    _conv_init,
    _fire,
    _maxpool_ceil,
    torch_feature_indices,
)


@dataclass(frozen=True)
class ClassifierSpec:
    """Static classifier configuration.

    ``num_fires`` selects the trunk prefix of ``ARCH_SPECS[arch]``; the
    default 8 on 'squeezedet' reproduces torchvision squeezenet1_1
    (trunk out = 512 channels)."""

    arch: str = "squeezedet"
    num_classes: int = 10
    num_fires: int = 8
    dropout_prob: float = 0.5
    compute_dtype: Any = jnp.float32

    @property
    def trunk_channels(self) -> int:
        n = 0
        for item in ARCH_SPECS[self.arch]["body"]:
            if item == "pool":
                continue
            n += 1
            if n == self.num_fires:
                return item[3] + item[4]  # expand1 + expand3 concat
        raise ValueError(
            f"{self.arch} has only {n} fire modules (< {self.num_fires})"
        )


def trunk_body(spec: ClassifierSpec) -> list:
    """The body prefix (pools + first ``num_fires`` fires). Trailing pools
    after the last included fire are dropped."""
    out, fires = [], 0
    for item in ARCH_SPECS[spec.arch]["body"]:
        if item == "pool":
            out.append(item)
            continue
        out.append(item)
        fires += 1
        if fires == spec.num_fires:
            break
    return out


def init_classifier_params(rng: jax.Array, spec: ClassifierSpec) -> Params:
    """He/fan-in init for the trunk (we train from scratch — the reference
    gaussian-.005 init is for fine-tuning and leaves deep stacks dead,
    see models/squeezedet.init_params) and for the 1x1 classifier conv."""
    arch = ARCH_SPECS[spec.arch]
    stem = arch["stem"]
    keys = iter(jax.random.split(rng, 32))
    params: Params = {
        "stem": _conv_init(
            next(keys), stem["kernel"], stem["kernel"], 3, stem["out"], None
        )
    }
    fire_i = 0
    for item in trunk_body(spec):
        if item == "pool":
            continue
        _, cin, sq, e1, e3 = item
        params[f"fire{fire_i}"] = {
            "squeeze": _conv_init(next(keys), 1, 1, cin, sq, None),
            "expand1": _conv_init(next(keys), 1, 1, sq, e1, None),
            "expand3": _conv_init(next(keys), 3, 3, sq, e3, None),
        }
        fire_i += 1
    # torchvision inits the final conv at normal(0, .01): logits start near
    # zero so the CE landscape is smooth regardless of trunk scale
    params["classifier"] = _conv_init(
        next(keys), 1, 1, spec.trunk_channels, spec.num_classes, 0.01
    )
    return params


def forward_classifier(
    params: Params,
    images: jnp.ndarray,
    spec: ClassifierSpec,
    *,
    training: bool = False,
    dropout_rng: jax.Array | None = None,
) -> jnp.ndarray:
    """(B, H, W, 3) whitened NHWC -> (B, num_classes) fp32 logits.

    Head: dropout -> 1x1 conv -> global average pool. torchvision's
    SqueezeNet.classifier inserts a ReLU before the pool; we deliberately
    omit it — on low-resolution crops (few spatial positions) that ReLU is
    a dead-logit trap: once a class's conv output goes negative at every
    position its logit pins at exactly 0 with zero gradient forever
    (observed: training frozen at (C-1)/C accuracy). The ReLU'd variant
    only matters for ImageNet-checkpoint INFERENCE parity, and
    ``classifier.1`` is discarded by detection fine-tuning anyway
    (utils/checkpoint.load_pth_params skips ``base.classifier``)."""
    arch = ARCH_SPECS[spec.arch]
    stem = arch["stem"]
    dtype = spec.compute_dtype

    if training and spec.dropout_prob > 0 and dropout_rng is None:
        raise ValueError("dropout_rng required when training with dropout")

    x = jax.nn.relu(
        _conv(
            images, params["stem"], stride=stem["stride"], pad=stem["pad"], dtype=dtype
        )
    )
    fire_i = 0
    for item in trunk_body(spec):
        if item == "pool":
            x = _maxpool_ceil(x)
        else:
            x = _fire(x, params[f"fire{fire_i}"], dtype)
            fire_i += 1

    if training and spec.dropout_prob > 0:
        keep = 1.0 - spec.dropout_prob
        mask = jax.random.bernoulli(dropout_rng, keep, x.shape)
        x = jnp.where(mask, x / jnp.asarray(keep, x.dtype), 0.0)

    x = _conv(x, params["classifier"], dtype=dtype)
    return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)


def export_torchvision_pth(params: Params, spec: ClassifierSpec, path: str) -> None:
    """Save trained classifier params as a bare torchvision-format
    ``squeezenet1_1`` state dict (.pth).

    Keys are exactly what ``utils/checkpoint._normalize_torch_keys`` expects
    of an official ImageNet file (bare ``features.*`` / ``classifier.1.*``;
    reference consumes the same file at src/utils/model.py:43-61); weights
    are transposed HWIO -> OIHW. Detection fine-tuning then loads it with
    ``--load_model <path>`` — the tolerant loader fills stem+fire0..7 and
    keeps fresh init for the detection-only fires and ConvDet head."""
    import torch

    feat = torch_feature_indices(spec.arch)
    state: dict[str, Any] = {}

    def put(stem_key: str, p) -> None:
        w = np.asarray(p["w"]).transpose(3, 2, 0, 1)  # HWIO -> OIHW
        state[f"{stem_key}.weight"] = torch.from_numpy(np.ascontiguousarray(w))
        state[f"{stem_key}.bias"] = torch.from_numpy(np.asarray(p["b"]).copy())

    put(f"features.{feat['stem']}", params["stem"])
    for i in range(spec.num_fires):
        idx = feat[f"fire{i}"]
        put(f"features.{idx}.squeeze", params[f"fire{i}"]["squeeze"])
        put(f"features.{idx}.expand1x1", params[f"fire{i}"]["expand1"])
        put(f"features.{idx}.expand3x3", params[f"fire{i}"]["expand3"])
    put("classifier.1", params["classifier"])
    torch.save(state, path)
