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
