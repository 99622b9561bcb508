import jax
import jax.numpy as jnp
import numpy as np
import pytest

from squeezedet_tpu.models.squeezedet import (
    ARCH_SPECS,
    ModelSpec,
    count_params,
    forward,
    init_params,
    torch_feature_indices,
    _maxpool_ceil,
)

import torch
import torch.nn.functional as F

from tests.torch_oracle import forward_torch


def _np_params(params):
    return jax.tree.map(np.asarray, params)


def test_output_shape_kitti():
    spec = ModelSpec(num_classes=3, anchors_per_grid=9)
    params = init_params(jax.random.PRNGKey(0), spec)
    x = jnp.zeros((1, 384, 1248, 3))
    pred = forward(params, x, spec)
    assert pred.shape == (1, 24 * 78 * 9, 8)


@pytest.mark.parametrize("h,w", [(96, 96), (95, 130), (192, 100)])
def test_maxpool_ceil_matches_torch(h, w):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, h, w, 4)).astype(np.float32)
    got = np.asarray(_maxpool_ceil(jnp.asarray(x)))
    want = (
        F.max_pool2d(
            torch.from_numpy(x).permute(0, 3, 1, 2), 3, stride=2, ceil_mode=True
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("h,w", [(96, 96), (95, 130), (192, 100), (24, 78)])
def test_maxpool_ceil_gradient_matches_torch(h, w):
    """The mask-based custom VJP must reproduce the standard maxpool
    gradient (torch reference) on tie-free inputs."""
    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, h, w, 4)).astype(np.float32)

    def loss(z):
        # non-uniform cotangent to exercise every window offset
        y = _maxpool_ceil(z)
        wgt = jnp.arange(y.size, dtype=jnp.float32).reshape(y.shape)
        return jnp.sum(y * wgt)

    got = np.asarray(jax.grad(loss)(jnp.asarray(x)))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2).requires_grad_(True)
    yt = F.max_pool2d(xt, 3, stride=2, ceil_mode=True)
    wgt = (
        torch.arange(yt.numel(), dtype=torch.float32)
        .reshape(yt.permute(0, 2, 3, 1).shape)
        .permute(0, 3, 1, 2)
    )
    (yt * wgt).sum().backward()
    want = xt.grad.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("arch", ["squeezedet", "squeezedetplus"])
def test_forward_matches_torch_oracle(arch):
    spec = ModelSpec(arch=arch, num_classes=3, anchors_per_grid=9)
    params = init_params(jax.random.PRNGKey(1), spec)
    x = np.random.default_rng(2).normal(size=(2, 96, 160, 3)).astype(np.float32)

    got = np.asarray(forward(params, jnp.asarray(x), spec))
    want = forward_torch(_np_params(params), x, spec)
    assert got.shape == want.shape == (2, 6 * 10 * 9, 8)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_grid_divides_by_16():
    spec = ModelSpec()
    params = init_params(jax.random.PRNGKey(0), spec)
    # non-multiple-of-16 input still runs (ceil pooling), grid = ceil-chain
    x = jnp.zeros((1, 100, 200, 3))
    pred = forward(params, x, spec)
    # conv s2: 50x100 -> pool(ceil) 25x50 -> 12x25 -> 6x12
    assert pred.shape == (1, 6 * 12 * 9, 8)


def test_param_count_squeezedet():
    spec = ModelSpec()
    params = init_params(jax.random.PRNGKey(0), spec)
    n = count_params(params)
    # SqueezeNet1.1 backbone ~1.23M + convdet 3*3*768*72+72
    assert 1_500_000 < n < 2_500_000


def test_dropout_train_vs_eval():
    spec = ModelSpec(dropout_prob=0.5)
    params = init_params(jax.random.PRNGKey(0), spec)
    # the tiny gaussian init makes deep activations underflow to exactly 0
    # on CPU, hiding dropout; scale weights so signal survives all layers
    params = jax.tree.map(lambda a: a * 40.0, params)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 96, 96, 3)), jnp.float32
    )
    eval_out = forward(params, x, spec, training=False)
    train_out = forward(
        params, x, spec, training=True, dropout_rng=jax.random.PRNGKey(3)
    )
    assert not np.allclose(np.asarray(eval_out), np.asarray(train_out))
    with pytest.raises(ValueError):
        forward(params, x, spec, training=True)


def test_torch_feature_index_mapping():
    m = torch_feature_indices("squeezedet")
    # conv at 0; fires at reference Sequential indices 3,4,6,7,9..14
    assert m["stem"] == 0
    assert [m[f"fire{i}"] for i in range(10)] == [3, 4, 6, 7, 9, 10, 11, 12, 13, 14]
    mp = torch_feature_indices("squeezedetplus")
    assert [mp[f"fire{i}"] for i in range(10)] == [3, 4, 5, 7, 8, 9, 10, 12, 13, 14]


def test_bf16_compute_close_to_fp32():
    spec32 = ModelSpec()
    spec16 = ModelSpec(compute_dtype=jnp.bfloat16)
    params = init_params(jax.random.PRNGKey(1), spec32)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(1, 96, 96, 3)), jnp.float32)
    out32 = np.asarray(forward(params, x, spec32))
    out16 = np.asarray(forward(params, x, spec16))
    assert out16.dtype == np.float32  # head always returns fp32
    # loose tolerance: bf16 has ~3 decimal digits
    np.testing.assert_allclose(out16, out32, rtol=0.2, atol=0.05)


def test_channel_padded_arch_is_exact():
    """Zero-channel-padding (models/squeezedet.register_padded_arch) is an
    arithmetically exact transform: the padded twin must reproduce the base
    forward bit-for-bit at fp32. Built for the round-3 MFU measurement —
    padding was measured SLOWER on v5e (see EVIDENCE.md) and retired as a
    default, but the transform + this parity gate remain the audit trail."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from squeezedet_tpu.models.squeezedet import (
        ModelSpec,
        forward,
        init_params,
        pad_params_to_arch,
        register_padded_arch,
    )

    rng = np.random.default_rng(11)
    imgs = jnp.asarray(rng.normal(size=(2, 96, 160, 3)).astype(np.float32))
    for arch in ("squeezedet", "squeezedetplus"):
        spec = ModelSpec(arch=arch, num_classes=3, anchors_per_grid=3,
                         dropout_prob=0.0)
        params = init_params(jax.random.PRNGKey(3), spec)
        base = forward(params, imgs, spec)
        name = register_padded_arch(arch, 64)
        pspec = ModelSpec(arch=name, num_classes=3, anchors_per_grid=3,
                          dropout_prob=0.0)
        out = forward(pad_params_to_arch(params, arch, name), imgs, pspec)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(base), rtol=1e-6, atol=1e-6
        )
