"""Pallas fused Fire kernel vs the lax reference path (interpret mode on
the CPU backend; the real-TPU comparison runs in bench/verification)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from squeezedet_tpu.ops.pallas.fire import _fire_lax, fire_fused


def _weights(rng, c, s, e1, e3):
    k = iter(jax.random.split(rng, 6))
    return dict(
        wsq=jax.random.normal(next(k), (1, 1, c, s)) * 0.1,
        bsq=jax.random.normal(next(k), (s,)) * 0.1,
        we1=jax.random.normal(next(k), (1, 1, s, e1)) * 0.1,
        be1=jax.random.normal(next(k), (e1,)) * 0.1,
        we3=jax.random.normal(next(k), (3, 3, s, e3)) * 0.1,
        be3=jax.random.normal(next(k), (e3,)) * 0.1,
    )


@pytest.mark.parametrize(
    "b,h,w,c,s,e1,e3",
    [
        (1, 8, 16, 16, 4, 8, 8),
        (2, 12, 10, 8, 4, 8, 8),   # h=12 -> tile 12 (single tile)
        (1, 16, 8, 8, 4, 4, 4),    # h=16 -> tile 16
        (2, 24, 10, 8, 4, 8, 8),   # tile 24
    ],
)
def test_fire_fused_matches_lax(b, h, w, c, s, e1, e3):
    rng = jax.random.PRNGKey(0)
    p = _weights(rng, c, s, e1, e3)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, h, w, c), jnp.float32)

    want = np.asarray(_fire_lax(x, **p))
    got = np.asarray(
        fire_fused(
            x, p["wsq"], p["bsq"], p["we1"], p["be1"], p["we3"], p["be3"], True
        )
    )
    assert got.shape == want.shape == (b, h, w, e1 + e3)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fire_fused_multi_tile_boundaries():
    """h=64 forces multiple row tiles; checks halo handling at tile seams
    and image borders."""
    rng = jax.random.PRNGKey(2)
    p = _weights(rng, 8, 4, 8, 8)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 12, 8), jnp.float32)
    want = np.asarray(_fire_lax(x, **p))
    got = np.asarray(
        fire_fused(
            x, p["wsq"], p["bsq"], p["we1"], p["be1"], p["we3"], p["be3"], True
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fire_fused_gradients_match_lax():
    rng = jax.random.PRNGKey(4)
    p = _weights(rng, 8, 4, 4, 4)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 8, 8), jnp.float32)

    def loss_fused(x, wsq, bsq, we1, be1, we3, be3):
        return (fire_fused(x, wsq, bsq, we1, be1, we3, be3, True) ** 2).sum()

    def loss_lax(x, wsq, bsq, we1, be1, we3, be3):
        return (_fire_lax(x, wsq, bsq, we1, be1, we3, be3) ** 2).sum()

    args = (x, p["wsq"], p["bsq"], p["we1"], p["be1"], p["we3"], p["be3"])
    g_fused = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    g_lax = jax.grad(loss_lax, argnums=tuple(range(7)))(*args)
    for a, b in zip(g_fused, g_lax):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
