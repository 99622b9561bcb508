"""Driver-contract tests: entry() shapes and the multichip dryrun."""

import numpy as np
import pytest


def test_entry_returns_fn_and_args():
    import __graft_entry__ as g

    fn, args = g.entry()
    params, images, anchors = args
    assert images.shape == (2, 384, 1248, 3)
    assert anchors.shape == (16848, 4)
    assert callable(fn)


def test_entry_fn_runs_small():
    """Run the entry fn logic at reduced resolution (full KITTI res on the
    CPU test backend is needlessly slow; the driver compile-checks full
    size on TPU)."""
    import jax
    import jax.numpy as jnp

    from squeezedet_tpu.core.anchors import generate_anchors
    from squeezedet_tpu.data.kitti import KITTI_ANCHOR_SEEDS
    from squeezedet_tpu.models.squeezedet import ModelSpec, init_params, forward
    from squeezedet_tpu.ops.postprocess import postprocess

    spec = ModelSpec()
    params = init_params(jax.random.PRNGKey(0), spec)
    anchors = jnp.asarray(generate_anchors((6, 10), (96, 160), KITTI_ANCHOR_SEEDS))
    out = postprocess(
        forward(params, jnp.zeros((1, 96, 160, 3)), spec),
        anchors,
        input_size=(96, 160),
        num_classes=3,
    )
    assert out["boxes"].shape == (1, 64, 4)


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # conftest provides 8 virtual CPU devices
