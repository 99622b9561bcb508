"""SqueezeDet / SqueezeDet+ backbones and ConvDet head — functional JAX.

TPU-first design decisions:

- **NHWC layout** end to end (TPU-native); the PyTorch-checkpoint converter
  transposes OIHW -> HWIO once at load time.
- **Params are a plain nested-dict pytree** (no module framework): trivially
  shardable with `NamedSharding`, checkpointable with orbax, and easy to map
  from the reference state-dict names.
- **Configurable compute dtype**: fp32 for bit-parity gates, bf16 for the MXU
  fast path. The head output is always returned in fp32 — decode/loss math
  (exp, softmax, IoU) stays in fp32 regardless.
- Architecture topology is data (`ARCH_SPECS`), so the forward pass, the
  parameter initializer, and the torch-key converter all derive from one spec
  (reference topologies: src/model/squeezedet.py:33-49 for `squeezedet`,
  :50-67 for `squeezedetplus`; ConvDet head :73-75; gaussian init :89-97).
- Ceil-mode 3x3/s2 max-pooling is reproduced with explicit right/bottom
  padding in `lax.reduce_window` — this is what keeps the 384x1248 input on
  the 24x78 anchor grid; wrong padding silently shifts every anchor.

The head output is reshaped NHWC (B, H, W, K*(C+5)) -> (B, H*W*K, C+5), so
anchor index (h*W + w)*K + k lines up with
:func:`squeezedet_tpu.core.anchors.generate_anchors`.
"""

from __future__ import annotations


from dataclasses import dataclass

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Params = dict[str, Any]

# Each spec: stem conv (kernel, out_ch, stride, pad) followed by an ordered
# list of 'pool' markers and fire modules (in_ch, squeeze, expand1, expand3).
ARCH_SPECS = {
    "squeezedet": {
        "stem": dict(kernel=3, out=64, stride=2, pad=1),
        "body": [
            "pool",
            ("fire", 64, 16, 64, 64),
            ("fire", 128, 16, 64, 64),
            "pool",
            ("fire", 128, 32, 128, 128),
            ("fire", 256, 32, 128, 128),
            "pool",
            ("fire", 256, 48, 192, 192),
            ("fire", 384, 48, 192, 192),
            ("fire", 384, 64, 256, 256),
            ("fire", 512, 64, 256, 256),
            ("fire", 512, 96, 384, 384),
            ("fire", 768, 96, 384, 384),
        ],
        "out_channels": 768,
    },
    "squeezedetplus": {
        "stem": dict(kernel=7, out=96, stride=2, pad=3),
        "body": [
            "pool",
            ("fire", 96, 96, 64, 64),
            ("fire", 128, 96, 64, 64),
            ("fire", 128, 192, 128, 128),
            "pool",
            ("fire", 256, 192, 128, 128),
            ("fire", 256, 288, 192, 192),
            ("fire", 384, 288, 192, 192),
            ("fire", 384, 384, 256, 256),
            "pool",
            ("fire", 512, 384, 256, 256),
            ("fire", 512, 384, 256, 256),
            ("fire", 512, 384, 256, 256),
        ],
        "out_channels": 512,
    },
}


@dataclass(frozen=True)
class ModelSpec:
    """Static model configuration captured in jit closures."""

    arch: str = "squeezedet"
    num_classes: int = 3
    anchors_per_grid: int = 9
    dropout_prob: float = 0.5
    compute_dtype: Any = jnp.float32
    init_scheme: str = "reference"  # 'reference' (gaussian .005/.002, for
    #   fine-tuning parity) | 'he' (fan-in scaled, for from-scratch training
    #   — the reference init leaves a 12-layer net nearly dead at random
    #   init; the reference always starts from ImageNet weights)
    remat: bool = False  # rematerialise fire activations in the backward
    #   pass (jax.checkpoint per fire): the bwd recomputes each fire's
    #   forward instead of keeping its activations live across the whole
    #   backward — the standard TPU FLOPs-for-HBM trade for big batches /
    #   high-res inputs. Numerically identical to remat=False.

    @property
    def head_channels(self) -> int:
        return self.anchors_per_grid * (self.num_classes + 5)

    @property
    def backbone_channels(self) -> int:
        return ARCH_SPECS[self.arch]["out_channels"]

    def grid_size(self, input_size: tuple[int, int]) -> tuple[int, int]:
        return (input_size[0] // 16, input_size[1] // 16)


def fire_param_names(spec_body) -> list[str]:
    return [f"fire{i}" for i in range(sum(1 for s in spec_body if s != "pool"))]


def torch_feature_indices(arch: str) -> dict[str, int]:
    """Map our param names to the reference `base.features.<idx>` Sequential
    indices (conv at 0, ReLU at 1, then pools/fires in body order) for the
    checkpoint converter. Parity: reference src/model/squeezedet.py:33-67."""
    spec = ARCH_SPECS[arch]
    mapping = {"stem": 0}
    idx = 2
    fire_i = 0
    for item in spec["body"]:
        if item == "pool":
            idx += 1
        else:
            mapping[f"fire{fire_i}"] = idx
            fire_i += 1
            idx += 1
    return mapping


def _conv_init(key, kh, kw, cin, cout, std):
    wkey, _ = jax.random.split(key)
    if std is None:  # He/fan-in scaling for ReLU stacks
        std = float(np.sqrt(2.0 / (kh * kw * cin)))
    w = jax.random.normal(wkey, (kh, kw, cin, cout), dtype=jnp.float32) * std
    b = jnp.zeros((cout,), dtype=jnp.float32)
    return {"w": w, "b": b}


def init_params(rng: jax.Array, spec: ModelSpec) -> Params:
    """'reference' init: gaussian std 0.002 for the ConvDet head, 0.005
    elsewhere, zero biases (reference src/model/squeezedet.py:89-97 —
    intended for ImageNet fine-tuning). 'he' init: fan-in scaled backbone
    for from-scratch training; the head keeps the small reference std so
    early score/class outputs stay near neutral."""
    arch = ARCH_SPECS[spec.arch]
    stem = arch["stem"]
    keys = iter(jax.random.split(rng, 64))
    body_std = 0.005 if spec.init_scheme == "reference" else None

    params: Params = {
        "stem": _conv_init(
            next(keys), stem["kernel"], stem["kernel"], 3, stem["out"], body_std
        )
    }
    fire_i = 0
    for item in arch["body"]:
        if item == "pool":
            continue
        _, cin, sq, e1, e3 = item
        params[f"fire{fire_i}"] = {
            "squeeze": _conv_init(next(keys), 1, 1, cin, sq, body_std),
            "expand1": _conv_init(next(keys), 1, 1, sq, e1, body_std),
            "expand3": _conv_init(next(keys), 3, 3, sq, e3, body_std),
        }
        fire_i += 1
    params["convdet"] = _conv_init(
        next(keys), 3, 3, arch["out_channels"], spec.head_channels, 0.002
    )
    return params


def _conv(x, p, stride=1, pad=0, dtype=jnp.float32):
    w = p["w"].astype(dtype)
    out = lax.conv_general_dilated(
        x.astype(dtype),
        w,
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype,
    )
    return out + p["b"].astype(dtype)


def _pool_geometry(h, w, window=3, stride=2):
    """ceil_mode output extent + right/bottom padding (torch semantics:
    pad just enough that the last partial window is kept)."""
    out_h = -(-(h - window) // stride) + 1
    out_w = -(-(w - window) // stride) + 1
    pad_h = max(0, (out_h - 1) * stride + window - h)
    pad_w = max(0, (out_w - 1) * stride + window - w)
    return out_h, out_w, pad_h, pad_w


def _maxpool_ceil_primal(x, window=3, stride=2):
    h, w = x.shape[1], x.shape[2]
    _, _, pad_h, pad_w = _pool_geometry(h, w, window, stride)
    neg_inf = (
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    )
    return lax.reduce_window(
        x,
        neg_inf,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
    )


def _maxpool_ceil(x):
    """3x3/s2 ceil-mode max pool. The gradient stays on XLA's
    select-and-scatter — measured on v5e (KITTI shapes, batch 20, bf16)
    it is the FASTEST available backward at 7.6/2.9/1.8 ms standalone for
    the three pools. Alternatives we built and measured (round 2, see
    EVIDENCE.md): XLA shift-mask reformulations +37..+100 ms/step (every
    shifted plane is an HBM round-trip), separable 1-D pools ~equal
    (8.8/3.1/1.6 ms), and a fused Pallas mask kernel 33/14.8/14.4 ms
    (Mosaic cannot lower any sublane element-repeat, forcing 4 upsampled
    aux inputs = 6x HBM traffic). Retired per measurement; the gradient
    parity tests vs torch remain (tests/test_model.py)."""
    return _maxpool_ceil_primal(x)


def _fire(x, p, dtype):
    """Squeeze 1x1 -> ReLU -> parallel expand 1x1 & 3x3 -> ReLU -> concat.

    Parity: reference src/model/squeezedet.py:9-23. The concat order
    (expand1x1 first) determines channel layout and must match checkpoints.

    A fused Pallas twin (ops/pallas/fire.py, squeeze activation pinned in
    VMEM) was measured END-TO-END in round 3 and retired: it loses on both
    arches at KITTI shapes (squeezedetplus predict 25.8 vs 23.4 ms/batch-20,
    squeezedet 13.5 vs 10.1; train 89.4 vs 82.0 / 41.6 vs 37.6 ms) because
    the custom-call boundary blocks XLA's conv/pool fusion around it even
    where the kernel wins standalone (96x312: 4.4 vs 5.0 ms). Measurements
    in EVIDENCE.md; the kernel + its parity tests remain as the reference
    Pallas implementation.
    """
    s = jax.nn.relu(_conv(x, p["squeeze"], dtype=dtype))
    e1 = jax.nn.relu(_conv(s, p["expand1"], dtype=dtype))
    e3 = jax.nn.relu(_conv(s, p["expand3"], pad=1, dtype=dtype))
    return jnp.concatenate([e1, e3], axis=-1)


def forward(
    params: Params,
    images: jnp.ndarray,
    spec: ModelSpec,
    *,
    training: bool = False,
    dropout_rng: jax.Array | None = None,
) -> jnp.ndarray:
    """Run backbone + ConvDet head.

    :param images: (B, H, W, 3) NHWC, already whitened.
    :return: (B, num_anchors, num_classes + 5) raw head output in fp32,
        per-anchor layout [class logits | objectness | deltas].
    """
    arch = ARCH_SPECS[spec.arch]
    stem = arch["stem"]
    dtype = spec.compute_dtype

    if training and spec.dropout_prob > 0 and dropout_rng is None:
        raise ValueError("dropout_rng required when training with dropout")

    stem_p = params["stem"]
    if "m" in stem_p:
        # raw-ingest params (fold_whitening): subtract the dataset mean on
        # device so the conv's zero padding lands on whitened zero exactly
        images = images.astype(jnp.float32) - stem_p["m"]
    x = jax.nn.relu(
        _conv(images, stem_p, stride=stem["stride"], pad=stem["pad"], dtype=dtype)
    )
    fire = _fire
    if spec.remat:
        fire = jax.checkpoint(_fire, static_argnums=(2,))
    fire_i = 0
    for item in arch["body"]:
        if item == "pool":
            x = _maxpool_ceil(x)
        else:
            x = fire(x, params[f"fire{fire_i}"], dtype)
            fire_i += 1

    if training and spec.dropout_prob > 0:
        keep = 1.0 - spec.dropout_prob
        mask = jax.random.bernoulli(dropout_rng, keep, x.shape)
        x = jnp.where(mask, x / jnp.asarray(keep, x.dtype), 0.0)

    x = _conv(x, params["convdet"], pad=1, dtype=dtype)

    b, h, w, _ = x.shape
    pred = x.reshape(b, h * w * spec.anchors_per_grid, spec.num_classes + 5)
    return pred.astype(jnp.float32)


def count_params(params: Params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def arch_flops(spec: ModelSpec, input_size: tuple[int, int], batch: int = 1) -> int:
    """Analytic conv FLOPs (2·MACs) of one forward pass — the numerator of
    the MFU estimate reported by bench.py. Pools/ReLU/bias are ignored
    (<1% of conv FLOPs at these shapes)."""
    arch = ARCH_SPECS[spec.arch]
    stem = arch["stem"]
    h = -(-input_size[0] // stem["stride"])
    w = -(-input_size[1] // stem["stride"])
    flops = 2 * h * w * stem["out"] * stem["kernel"] ** 2 * 3
    for item in arch["body"]:
        if item == "pool":
            h, w = _pool_geometry(h, w)[:2]
        else:
            _, cin, sq, e1, e3 = item
            flops += 2 * h * w * (cin * sq + sq * e1 + 9 * sq * e3)
    flops += 2 * h * w * 9 * arch["out_channels"] * spec.head_channels
    return flops * batch


def _round_up(x: int, r: int) -> int:
    return -(-x // r) * r


def register_padded_arch(base_arch: str, round_to: int) -> str:
    """Create (and register in ARCH_SPECS) a channel-padded twin of
    ``base_arch`` with every internal squeeze/expand/stem width rounded up
    to a multiple of ``round_to``.

    Zero-padding channel dims is arithmetically EXACT: padded output
    channels carry zero weights+bias (ReLU(0)=0) and padded input channels
    meet zero weight rows, so the real channels' values are bit-identical
    (zeros contribute exactly 0 to every MXU accumulation). Built for the
    round-3 MFU measurement (VERDICT #2): SqueezeNet's narrow channels
    underuse the 128-lane MXU; this makes the aligned variant measurable
    with the existing forward/oracle parity tests as the parity story.
    The input (3ch) and head output (A*(C+5)) are never padded."""
    name = f"{base_arch}_pad{round_to}"
    if name in ARCH_SPECS:
        return name
    spec = ARCH_SPECS[base_arch]
    stem = dict(spec["stem"])
    stem["out"] = _round_up(stem["out"], round_to)
    body: list = []
    prev_out = stem["out"]
    for item in spec["body"]:
        if item == "pool":
            body.append("pool")
            continue
        _, _, sq, e1, e3 = item
        sq_p, e1_p, e3_p = (
            _round_up(sq, round_to),
            _round_up(e1, round_to),
            _round_up(e3, round_to),
        )
        body.append(("fire", prev_out, sq_p, e1_p, e3_p))
        prev_out = e1_p + e3_p
    ARCH_SPECS[name] = {"stem": stem, "body": body, "out_channels": prev_out}
    return name


def pad_params_to_arch(params: Params, base_arch: str, padded_arch: str) -> Params:
    """Scatter ``base_arch`` weights into a ``padded_arch``-shaped pytree
    (see :func:`register_padded_arch`). The fire concat layout means the
    original input channel j of a post-concat consumer maps to j (j < E1)
    or E1_padded + (j - E1) (j >= E1) in the padded tensor."""
    base = ARCH_SPECS[base_arch]
    padded = ARCH_SPECS[padded_arch]

    def pad_conv(p, in_map, cin_p, cout_p):
        kh, kw, _, cout = p["w"].shape
        w = jnp.zeros((kh, kw, cin_p, cout_p), p["w"].dtype)
        w = w.at[:, :, jnp.asarray(in_map), :cout].set(p["w"])
        b = jnp.zeros((cout_p,), p["b"].dtype).at[:cout].set(p["b"])
        return {"w": w, "b": b}

    out: Params = {
        "stem": pad_conv(params["stem"], [0, 1, 2], 3, padded["stem"]["out"])
    }
    in_map = list(range(base["stem"]["out"]))  # stem out: identity map
    fire_i = 0
    for item, item_p in zip(base["body"], padded["body"]):
        if item == "pool":
            continue
        _, _, sq, e1, e3 = item
        _, cin_p, sq_p, e1_p, e3_p = item_p
        p = params[f"fire{fire_i}"]
        out[f"fire{fire_i}"] = {
            "squeeze": pad_conv(p["squeeze"], in_map, cin_p, sq_p),
            "expand1": pad_conv(p["expand1"], list(range(sq)), sq_p, e1_p),
            "expand3": pad_conv(p["expand3"], list(range(sq)), sq_p, e3_p),
        }
        in_map = list(range(e1)) + [e1_p + j for j in range(e3)]
        fire_i += 1
    out["convdet"] = pad_conv(
        params["convdet"],
        in_map,
        padded["out_channels"],
        params["convdet"]["w"].shape[3],
    )
    return out


def fold_whitening(params: Params, rgb_mean, rgb_std) -> Params:
    """Absorb the whitening scale ``1/std`` into the stem conv and attach
    the per-channel mean for on-device subtraction, so the network accepts
    *raw* 0-255 images: serving ships uint8 batches (4x less host->HBM
    traffic) and ``forward`` computes ``conv(W/s, x - m) + b`` — exactly
    ``conv(W, (x - m)/s) + b`` at EVERY position, including the stem's
    zero-padded borders, because padding zeros in ``x - m`` space ARE the
    whitened-path padding zeros.

    (The earlier all-bias fold ``b - sum_hw W m/s`` was exact only for
    interior windows: it subtracted the mean for kernel taps landing on
    the conv's zero padding too, effectively padding with whitened black
    — an O(1) stem-output error on border anchors with trained weights.
    Found by review, reproduced numerically; tests/test_fold_whitening.py
    pins the border rows now.)

    Whitening semantics match the host path (core/image.whiten). The
    ``"m"`` entry rides inside the folded stem dict; ``forward`` subtracts
    it when present and ``_conv`` ignores it.
    """
    mean = jnp.asarray(np.ravel(np.asarray(rgb_mean)), jnp.float32)
    std = jnp.asarray(np.ravel(np.asarray(rgb_std)), jnp.float32)

    w = params["stem"]["w"]  # (kh, kw, 3, out)
    out = dict(params)
    out["stem"] = {
        "w": w / std[None, None, :, None],
        "b": params["stem"]["b"],
        "m": mean,
    }
    return out
