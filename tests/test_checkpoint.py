import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from squeezedet_tpu.models.squeezedet import (
    ModelSpec,
    forward,
    init_params,
    torch_feature_indices,
)
from squeezedet_tpu.parallel.train import TaskSpec, init_train_state
from squeezedet_tpu.utils.checkpoint import (
    load_any,
    load_params,
    load_pth_params,
    load_train_state,
    save_params,
    save_train_state,
)

from tests.torch_oracle import forward_torch

SPEC = ModelSpec(num_classes=3, anchors_per_grid=9)


def _torch_state_dict(params, spec, prefix="base."):
    """Build a reference-style state dict (OIHW tensors) from our pytree."""
    feat = torch_feature_indices(spec.arch)
    sd = {}

    def put(stem, leaf):
        sd[f"{stem}.weight"] = torch.from_numpy(
            np.asarray(leaf["w"]).transpose(3, 2, 0, 1).copy()
        )
        sd[f"{stem}.bias"] = torch.from_numpy(np.asarray(leaf["b"]).copy())

    put(f"{prefix}features.{feat['stem']}", params["stem"])
    i = 0
    while f"fire{i}" in params:
        idx = feat[f"fire{i}"]
        put(f"{prefix}features.{idx}.squeeze", params[f"fire{i}"]["squeeze"])
        put(f"{prefix}features.{idx}.expand1x1", params[f"fire{i}"]["expand1"])
        put(f"{prefix}features.{idx}.expand3x3", params[f"fire{i}"]["expand3"])
        i += 1
    put(f"{prefix}convdet", params["convdet"])
    return sd


def test_pth_roundtrip_preserves_forward(tmp_path):
    """Export params as a reference-style .pth, reload, and check the model
    computes identical outputs."""
    src = init_params(jax.random.PRNGKey(0), SPEC)
    sd = _torch_state_dict(src, SPEC)
    path = str(tmp_path / "model.pth")
    torch.save({"epoch": 7, "state_dict": sd}, path)

    init = init_params(jax.random.PRNGKey(99), SPEC)  # different init
    loaded, epoch = load_pth_params(path, init, SPEC, verbose=False)
    assert epoch == 7

    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 96, 96, 3)), jnp.float32)
    out_src = np.asarray(forward(src, x, SPEC))
    out_loaded = np.asarray(forward(loaded, x, SPEC))
    np.testing.assert_allclose(out_loaded, out_src, rtol=1e-6, atol=1e-6)


def test_pth_module_prefix_stripped(tmp_path):
    src = init_params(jax.random.PRNGKey(0), SPEC)
    sd = _torch_state_dict(src, SPEC, prefix="module.base.")
    path = str(tmp_path / "dp.pth")
    torch.save({"epoch": 1, "state_dict": sd}, path)

    loaded, _ = load_pth_params(
        path, init_params(jax.random.PRNGKey(9), SPEC), SPEC, verbose=False
    )
    np.testing.assert_allclose(
        np.asarray(loaded["stem"]["w"]), np.asarray(src["stem"]["w"])
    )


def test_official_torchvision_format(tmp_path):
    """Bare features.* keys (no wrapper dict) like the torchvision ImageNet
    checkpoints; backbone tensors load, convdet stays at init."""
    src = init_params(jax.random.PRNGKey(0), SPEC)
    sd = _torch_state_dict(src, SPEC, prefix="")
    del sd["convdet.weight"], sd["convdet.bias"]
    sd = {k: v for k, v in sd.items() if k.startswith("features.")}
    path = str(tmp_path / "squeezenet1_1.pth")
    torch.save(sd, path)

    init = init_params(jax.random.PRNGKey(5), SPEC)
    loaded, epoch = load_pth_params(path, init, SPEC, verbose=False)
    assert epoch == 0
    np.testing.assert_allclose(
        np.asarray(loaded["fire3"]["squeeze"]["w"]),
        np.asarray(src["fire3"]["squeeze"]["w"]),
    )
    # head untouched
    np.testing.assert_allclose(
        np.asarray(loaded["convdet"]["w"]), np.asarray(init["convdet"]["w"])
    )


def test_pth_converted_cache(tmp_path, monkeypatch):
    """First .pth load writes a *_converted.npz cache; the second load must
    come from the cache without touching torch (reference caches
    *_converted.pth the same way, src/utils/model.py:55-61)."""
    src = init_params(jax.random.PRNGKey(0), SPEC)
    sd = _torch_state_dict(src, SPEC)
    path = str(tmp_path / "model.pth")
    torch.save({"epoch": 7, "state_dict": sd}, path)

    first, epoch = load_pth_params(
        path, init_params(jax.random.PRNGKey(1), SPEC), SPEC, verbose=False
    )
    assert epoch == 7
    assert os.path.exists(path + "_converted.npz")

    def boom(*a, **k):
        raise AssertionError("torch.load called despite converted cache")

    monkeypatch.setattr(torch, "load", boom)
    second, epoch2 = load_pth_params(
        path, init_params(jax.random.PRNGKey(2), SPEC), SPEC, verbose=False
    )
    assert epoch2 == 7
    for a, b in zip(jax.tree.leaves(first), jax.tree.leaves(second)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pth_shape_mismatch_keeps_init(tmp_path):
    src = init_params(jax.random.PRNGKey(0), SPEC)
    sd = _torch_state_dict(src, SPEC)
    sd["base.convdet.weight"] = torch.zeros(36, 768, 3, 3)  # wrong out chans
    path = str(tmp_path / "mismatch.pth")
    torch.save({"epoch": 2, "state_dict": sd}, path)

    init = init_params(jax.random.PRNGKey(5), SPEC)
    loaded, _ = load_pth_params(path, init, SPEC, verbose=False)
    np.testing.assert_allclose(
        np.asarray(loaded["convdet"]["w"]), np.asarray(init["convdet"]["w"])
    )
    # everything else loaded
    np.testing.assert_allclose(
        np.asarray(loaded["stem"]["w"]), np.asarray(src["stem"]["w"])
    )


def test_orbax_params_roundtrip(tmp_path):
    params = init_params(jax.random.PRNGKey(0), SPEC)
    path = str(tmp_path / "ckpt" / "model_3")
    save_params(path, params, epoch=3)
    template = init_params(jax.random.PRNGKey(4), SPEC)
    loaded, epoch = load_params(path, template)
    assert epoch == 3
    for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_train_state_roundtrip(tmp_path):
    task = TaskSpec(model=SPEC, input_size=(96, 160), num_anchors=180)
    state = init_train_state(init_params(jax.random.PRNGKey(0), SPEC), task)
    # make optimizer state non-trivial
    state = state._replace(step=jnp.asarray(17, jnp.int32))

    path = str(tmp_path / "ckpt" / "state_last")
    save_train_state(path, state, epoch=12, best=0.73)

    template = init_train_state(init_params(jax.random.PRNGKey(8), SPEC), task)
    restored, epoch, best = load_train_state(path, template)
    assert epoch == 12
    assert best == 0.73
    assert int(restored.step) == 17
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # legacy checkpoints without the best leaf still restore (best=None)
    path2 = str(tmp_path / "ckpt" / "state_legacy")
    save_train_state(path2, state, epoch=3)
    _, epoch2, best2 = load_train_state(path2, template)
    assert epoch2 == 3 and best2 is None


def test_load_any_dispatch(tmp_path):
    params = init_params(jax.random.PRNGKey(0), SPEC)
    path = str(tmp_path / "p1")
    save_params(path, params, epoch=5)
    loaded, epoch = load_any(path, init_params(jax.random.PRNGKey(1), SPEC), SPEC)
    assert epoch == 5


def test_save_pth_reference_format_roundtrip(tmp_path):
    """save_pth_params writes the reference's own checkpoint format
    ({'epoch', 'state_dict'} with base.* keys, OIHW): its state dict
    matches the independently-built reference-style dict exactly, and
    load_pth_params restores it bit-for-bit (two-way interop)."""
    from squeezedet_tpu.utils.checkpoint import save_pth_params

    for arch in ("squeezedet", "squeezedetplus"):
        spec = ModelSpec(arch=arch, num_classes=3, anchors_per_grid=9)
        params = jax.tree.map(
            np.asarray, init_params(jax.random.PRNGKey(2), spec)
        )
        path = str(tmp_path / f"export_{arch}.pth")
        save_pth_params(path, params, spec, epoch=41)

        blob = torch.load(path, map_location="cpu", weights_only=True)
        assert blob["epoch"] == 41
        expected = _torch_state_dict(params, spec)
        assert set(blob["state_dict"].keys()) == set(expected.keys())
        for k, v in expected.items():
            np.testing.assert_array_equal(blob["state_dict"][k].numpy(), v.numpy())

        restored, epoch = load_pth_params(
            path, init_params(jax.random.PRNGKey(9), spec), spec, verbose=False
        )
        assert epoch == 41
        for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_reference_pth_tool(tmp_path):
    """The CLI tool: orbax params dir -> reference .pth."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import export_reference_pth

    params = init_params(jax.random.PRNGKey(4), SPEC)
    ckpt = str(tmp_path / "model_best")
    save_params(ckpt, params, epoch=7)
    out = str(tmp_path / "exported.pth")
    export_reference_pth.main([ckpt, out])

    restored, epoch = load_pth_params(
        out, init_params(jax.random.PRNGKey(5), SPEC), SPEC, verbose=False
    )
    assert epoch == 7
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
