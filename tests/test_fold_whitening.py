import jax
import jax.numpy as jnp
import numpy as np

from squeezedet_tpu.data.kitti import KITTI_RGB_MEAN, KITTI_RGB_STD
from squeezedet_tpu.models.squeezedet import (
    ModelSpec,
    fold_whitening,
    forward,
    init_params,
)


def test_folded_stem_matches_host_whitening():
    spec = ModelSpec(num_classes=3, anchors_per_grid=9, dropout_prob=0.0)
    params = init_params(jax.random.PRNGKey(0), spec)
    folded = fold_whitening(params, KITTI_RGB_MEAN, KITTI_RGB_STD)

    raw = np.random.default_rng(0).integers(0, 256, (2, 96, 160, 3)).astype(
        np.float32
    )
    whitened = (raw - KITTI_RGB_MEAN) / KITTI_RGB_STD

    out_host_whiten = np.asarray(forward(params, jnp.asarray(whitened), spec))
    out_folded = np.asarray(forward(folded, jnp.asarray(raw), spec))
    np.testing.assert_allclose(out_folded, out_host_whiten, rtol=1e-3, atol=1e-4)


def test_folded_stem_exact_at_padded_borders():
    """The fold must be exact where the stem conv's zero padding overlaps
    the kernel window — the earlier all-bias fold subtracted the mean for
    padding taps too, an O(1) error on border outputs with unit-scale
    weights that the tiny-init full-forward test attenuated below its
    tolerance (found by review). Compare the stem conv DIRECTLY with
    realistic-magnitude weights."""
    from jax import lax

    rng = np.random.default_rng(7)
    w = rng.normal(0.0, 0.1, (3, 3, 3, 8)).astype(np.float32)
    b = rng.normal(0.0, 0.1, 8).astype(np.float32)
    params = {"stem": {"w": jnp.asarray(w), "b": jnp.asarray(b)}}
    folded = fold_whitening(params, KITTI_RGB_MEAN, KITTI_RGB_STD)

    raw = rng.integers(0, 256, (1, 16, 20, 3)).astype(np.float32)
    whitened = (raw - KITTI_RGB_MEAN) / KITTI_RGB_STD

    def stem(w_, b_, x):
        return lax.conv_general_dilated(
            jnp.asarray(x), w_, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b_

    ref = np.asarray(stem(params["stem"]["w"], params["stem"]["b"], whitened))
    got = np.asarray(
        stem(
            folded["stem"]["w"], folded["stem"]["b"],
            raw - np.asarray(folded["stem"]["m"]),
        )
    )
    # every position, INCLUDING the border rows/cols where padding overlaps
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
    # and the border rows genuinely exercise padding (non-trivial values)
    assert np.abs(ref[:, 0]).max() > 0.01


def test_folded_accepts_uint8_cast():
    spec = ModelSpec(num_classes=3, anchors_per_grid=9, dropout_prob=0.0)
    params = init_params(jax.random.PRNGKey(1), spec)
    folded = fold_whitening(params, KITTI_RGB_MEAN, KITTI_RGB_STD)

    raw_u8 = np.random.default_rng(1).integers(0, 256, (1, 96, 160, 3)).astype(
        np.uint8
    )
    # device-side cast path: uint8 -> float32 inside jit
    out_u8 = np.asarray(
        jax.jit(lambda p, x: forward(p, x.astype(jnp.float32), spec))(
            folded, jnp.asarray(raw_u8)
        )
    )
    out_f32 = np.asarray(forward(folded, jnp.asarray(raw_u8, jnp.float32), spec))
    np.testing.assert_allclose(out_u8, out_f32, rtol=1e-5, atol=1e-5)
