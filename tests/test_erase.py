"""Random-erasing occlusion augmentation (--erase_prob): host/device
parity and device-epoch integration. Host: core/image.py random_erase;
device twin: ops/augment.py sample_erase_params/apply_erase wired into
parallel/epoch._prep_batch."""

import jax
import jax.numpy as jnp
import numpy as np

from squeezedet_tpu.core.image import random_erase
from squeezedet_tpu.ops.augment import apply_erase, sample_erase_params
from squeezedet_tpu.ops.box_ops import xywh_to_xyxy
from squeezedet_tpu.parallel.epoch import _make_gather, _prep_batch, put_device_data
from squeezedet_tpu.parallel.mesh import make_mesh

from tests.test_device_data import ANCHORS, MEAN, _spec, _staged, _task


def test_host_erase_fills_rect():
    rng = np.random.RandomState(3)
    img = rng.uniform(-1, 1, (96, 160, 3)).astype(np.float32)
    orig = img.copy()
    out, meta = random_erase(img.copy(), {}, prob=1.0, rng=rng, fill=0.0)
    y1, x1, y2, x2 = meta["erased"]
    assert 0 <= y1 < y2 <= 96 and 0 <= x1 < x2 <= 160
    area = (y2 - y1) * (x2 - x1) / (96 * 160)
    assert 0.015 < area < 0.25  # target U(0.02, 0.2) + integer rounding
    assert np.all(out[y1:y2, x1:x2] == 0.0)
    mask = np.zeros((96, 160), bool)
    mask[y1:y2, x1:x2] = True
    np.testing.assert_array_equal(out[~mask], orig[~mask])


def test_host_erase_off_identity():
    rng = np.random.RandomState(0)
    img = rng.uniform(-1, 1, (32, 48, 3)).astype(np.float32)
    out, meta = random_erase(img.copy(), {}, prob=0.0, rng=rng)
    np.testing.assert_array_equal(out, img)
    assert np.all(meta["erased"] == 0)


def test_device_apply_matches_host_slice():
    """Given identical rect params, the device iota-mask fill equals the
    host slice assignment; on=False is the identity."""
    rng = np.random.RandomState(7)
    imgs = rng.uniform(0, 255, (4, 40, 64, 3)).astype(np.float32)
    erase = {
        "ey": jnp.array([3, 0, 20, 39], jnp.int32),
        "ex": jnp.array([5, 60, 0, 0], jnp.int32),
        "eh": jnp.array([10, 1, 20, 1], jnp.int32),
        "ew": jnp.array([12, 4, 64, 64], jnp.int32),
    }
    fill = jnp.asarray(MEAN.ravel())
    on = jnp.array([True, True, False, True])
    out = np.asarray(apply_erase(jnp.asarray(imgs), erase, on, fill))

    expect = imgs.copy()
    for i in range(4):
        if not bool(on[i]):
            continue
        y, x = int(erase["ey"][i]), int(erase["ex"][i])
        h, w = int(erase["eh"][i]), int(erase["ew"][i])
        expect[i, y : y + h, x : x + w] = MEAN.ravel()
    np.testing.assert_array_equal(out, expect)


def test_sample_erase_params_bounds():
    out_size = (96, 160)
    p = sample_erase_params(jax.random.PRNGKey(0), 256, out_size)
    ey, ex = np.asarray(p["ey"]), np.asarray(p["ex"])
    eh, ew = np.asarray(p["eh"]), np.asarray(p["ew"])
    assert np.all(eh > 0) and np.all(ew > 0)
    assert np.all(ey >= 0) and np.all(ey + eh <= 96)
    assert np.all(ex >= 0) and np.all(ex + ew <= 160)
    area = eh * ew / (96.0 * 160.0)
    assert area.min() > 0.01 and area.max() < 0.25
    # aspect spread: logU(0.3, 3.33) should produce both tall and wide
    ratio = eh / ew
    assert ratio.min() < 0.8 and ratio.max() > 1.25


def test_prep_batch_erase_zeroes_a_rect_per_image():
    """_prep_batch with erase_prob=1 differs from erase_prob=0 exactly on
    one rectangle per image, and the erased pixels whiten to ~0 (the fill
    is the dataset mean)."""
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)
    task = _task()
    data, n_loc, hw = put_device_data(mesh, _staged(16, seed=11))
    gather = _make_gather(mesh)
    a_xywh = jnp.asarray(ANCHORS)
    a_xyxy = xywh_to_xyxy(a_xywh)
    offsets = jnp.asarray((np.arange(8) * n_loc)[:, None].astype(np.int32))
    idx = jnp.zeros((8, 1), jnp.int32)
    key = jax.random.PRNGKey(42)

    # no drift/flip: drift pad strips are also mean-filled (whitened 0),
    # which would be indistinguishable from erased pixels below
    spec_off = _spec()._replace(drift_prob=0.0, flip_prob=0.0)
    spec_on = spec_off._replace(erase_prob=1.0)
    img_on, gt_on = _prep_batch(
        data, gather, idx, offsets, key, task, spec_on, a_xywh, a_xyxy,
        hw, train=True,
    )
    base_key, _, _ = jax.random.split(key, 3)  # the stream _prep_batch
    # feeds to sample_aug_params when erase is enabled
    img_off, gt_off = _prep_batch(
        data, gather, idx, offsets, base_key, task, spec_off, a_xywh,
        a_xyxy, hw, train=True,
    )
    img_on, img_off = np.asarray(img_on), np.asarray(img_off)

    for i in range(img_on.shape[0]):
        diff = np.any(img_on[i] != img_off[i], axis=-1)
        ys, xs = np.nonzero(diff)
        assert ys.size > 0  # prob=1: every image erased
        # the changed set is exactly the bounding rect of the changes
        rect_area = (ys.max() - ys.min() + 1) * (xs.max() - xs.min() + 1)
        assert ys.size == rect_area
        assert np.abs(img_on[i][diff]).max() < 1e-4  # mean whitens to 0
    # GT untouched: amodal supervision
    np.testing.assert_array_equal(
        np.asarray(gt_on), np.asarray(gt_off)
    )


def test_host_erase_copy_on_write_protects_source():
    """copy_on_write must leave the caller's array untouched (the raw-uint8
    pipeline can pass the dataset's RAM-cached image itself)."""
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (64, 96, 3)).astype(np.uint8)
    orig = img.copy()
    out, meta = random_erase(
        img, {}, prob=1.0, rng=rng, fill=127, copy_on_write=True
    )
    np.testing.assert_array_equal(img, orig)  # source untouched
    y1, x1, y2, x2 = meta["erased"]
    assert np.all(out[y1:y2, x1:x2] == 127)
