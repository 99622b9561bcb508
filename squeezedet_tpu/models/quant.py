"""Post-training int8 quantization (PTQ) for the serving path.

The v5e MXU runs s8 x s8 -> s32 at twice the bf16 rate, and int8
activations halve HBM traffic; for a serving-only path the accuracy cost
of 8-bit is usually small. This module quantizes a trained SqueezeDet:

- weights: symmetric per-output-channel int8 (`w_scale` (Cout,));
- activations: symmetric per-tensor int8, scales calibrated by running
  float forwards over a few batches and taking the running absmax of each
  conv *input* (plus the head input);
- compute: `lax.conv_general_dilated` on int8 operands with
  `preferred_element_type=int32` (the MXU-native s8 path), then a float
  rescale (x_scale * w_scale), bias add, ReLU, and requantization to the
  next layer's input scale — the rescale/requant chain is cheap VPU
  elementwise work that XLA fuses around the convs.

The head (ConvDet) output is dequantized to fp32 and fed to the ordinary
resolver/postprocess, so detection semantics are unchanged.

No reference counterpart (the reference serves fp32 torch,
src/engine/detector.py); this is a TPU-native serving extra. Accuracy is
gated in tests (tests/test_quant.py: quantized detections vs float on a
trained-ish model) and mAP-checked on the synthetic val set in EVIDENCE.md.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from squeezedet_tpu.models.squeezedet import ARCH_SPECS, ModelSpec

Params = Any

_INT8_MAX = 127.0


def _layer_names(arch: str) -> list[str]:
    names = ["stem"]
    fire_i = 0
    for item in ARCH_SPECS[arch]["body"]:
        if item != "pool":
            names.append(f"fire{fire_i}")
            fire_i += 1
    names.append("convdet")
    return names


def _quant_weight(w: jnp.ndarray):
    """Symmetric per-output-channel int8 for an HWIO kernel."""
    absmax = jnp.max(jnp.abs(w), axis=(0, 1, 2))  # (Cout,)
    scale = jnp.maximum(absmax, 1e-12) / _INT8_MAX
    q = jnp.clip(jnp.round(w / scale), -_INT8_MAX, _INT8_MAX).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _quant_act(x: jnp.ndarray, scale):
    return jnp.clip(
        jnp.round(x / scale), -_INT8_MAX, _INT8_MAX
    ).astype(jnp.int8)


def _conv_s8(x_q, w_q, stride=1, pad=0):
    return lax.conv_general_dilated(
        x_q,
        w_q,
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def calibrate_act_scales(params: Params, spec: ModelSpec, batches) -> dict:
    """Absmax calibration: float forward over `batches` (whitened NHWC
    float32), recording each conv-input absmax. Returns {conv_name: scale}.

    Conv names: stem, fire{i}.squeeze/.expand (expand1/expand3 share the
    squeeze output, hence one scale), convdet.
    """
    from squeezedet_tpu.models.squeezedet import _conv, _maxpool_ceil

    arch = ARCH_SPECS[spec.arch]
    absmax: dict[str, float] = {}

    def track(name, x):
        v = float(jnp.max(jnp.abs(x)))
        absmax[name] = max(absmax.get(name, 0.0), v)
        return x

    for images in batches:
        x = jnp.asarray(images, jnp.float32)
        track("stem", x)
        stem = arch["stem"]
        x = jax.nn.relu(
            _conv(x, params["stem"], stride=stem["stride"], pad=stem["pad"])
        )
        fire_i = 0
        for item in arch["body"]:
            if item == "pool":
                x = _maxpool_ceil(x)
            else:
                p = params[f"fire{fire_i}"]
                track(f"fire{fire_i}.squeeze", x)
                s = jax.nn.relu(_conv(x, p["squeeze"]))
                track(f"fire{fire_i}.expand", s)
                e1 = jax.nn.relu(_conv(s, p["expand1"]))
                e3 = jax.nn.relu(_conv(s, p["expand3"], pad=1))
                x = jnp.concatenate([e1, e3], axis=-1)
                fire_i += 1
        track("convdet", x)

    return {k: v / _INT8_MAX for k, v in absmax.items()}


def quantize_params(params: Params, spec: ModelSpec, act_scales: dict):
    """Pack int8 weights + float scales/biases for `forward_int8`."""
    q: dict[str, Any] = {"act_scales": dict(act_scales)}
    for name in _layer_names(spec.arch):
        if name.startswith("fire"):
            q[name] = {}
            for sub in ("squeeze", "expand1", "expand3"):
                wq, ws = _quant_weight(params[name][sub]["w"])
                q[name][sub] = {
                    "w": wq, "w_scale": ws,
                    "b": params[name][sub]["b"].astype(jnp.float32),
                }
        else:
            wq, ws = _quant_weight(params[name]["w"])
            q[name] = {
                "w": wq, "w_scale": ws,
                "b": params[name]["b"].astype(jnp.float32),
            }
    return q


def forward_int8(qparams, images: jnp.ndarray, spec: ModelSpec) -> jnp.ndarray:
    """Int8 backbone + head; mirrors models.squeezedet.forward (inference
    only: no dropout). `images`: whitened float32 NHWC — quantized to the
    calibrated stem scale on entry.

    :return: (B, A, C+5) raw head output in fp32.
    """
    from squeezedet_tpu.models.squeezedet import _maxpool_ceil

    arch = ARCH_SPECS[spec.arch]
    scales = qparams["act_scales"]

    def qconv_relu(x_q, x_scale, layer, stride=1, pad=0, relu=True):
        y = _conv_s8(x_q, layer["w"], stride=stride, pad=pad)
        y = y.astype(jnp.float32) * (x_scale * layer["w_scale"]) + layer["b"]
        return jax.nn.relu(y) if relu else y

    stem = arch["stem"]
    s0 = scales["stem"]
    x_q = _quant_act(jnp.asarray(images, jnp.float32), s0)
    x = qconv_relu(
        x_q, s0, qparams["stem"], stride=stem["stride"], pad=stem["pad"]
    )

    fire_i = 0
    for item in arch["body"]:
        if item == "pool":
            x = _maxpool_ceil(x)
        else:
            p = qparams[f"fire{fire_i}"]
            sin = scales[f"fire{fire_i}.squeeze"]
            s = qconv_relu(_quant_act(x, sin), sin, p["squeeze"])
            se = scales[f"fire{fire_i}.expand"]
            s_q = _quant_act(s, se)
            e1 = qconv_relu(s_q, se, p["expand1"])
            e3 = qconv_relu(s_q, se, p["expand3"], pad=1)
            x = jnp.concatenate([e1, e3], axis=-1)
            fire_i += 1

    sh = scales["convdet"]
    x = qconv_relu(
        _quant_act(x, sh), sh, qparams["convdet"], pad=1, relu=False
    )

    b, h, w, _ = x.shape
    pred = x.reshape(b, h * w * spec.anchors_per_grid, spec.num_classes + 5)
    return pred.astype(jnp.float32)
