"""On-device image augmentation: drift + flip + resize as one bilinear warp.

Device twin of the host pipeline whiten->drift->flip->resize
(core/image.py, reference src/utils/image.py:9-88). The host path must
materialize a *variable-size* drifted canvas before the fixed-size resize;
on device the same semantics collapse into a single static-shape gather:

    out(i, j) = orig( clip_y(fy(i)) + dy, clip_x(fx'(j)) + dx )

where ``fy/fx`` are the cv2-convention resize coordinates for the drifted
canvas size ``(H - dy, W - dx)``, ``fx'`` mirrors ``fx`` under flip, and
samples falling outside the original image read the RGB-mean pad value
(which whitens to ~zero, exactly like the reference's post-whiten zero
fill). Because the drifted canvas is a pure integer translation of the
original, bilinear-resampling it through the composed coordinates is
arithmetically identical to resizing the materialized canvas — asserted
against the host pipeline in tests/test_device_data.py (test_warp_matches_host_pipeline).

The warp is separable (rows then columns): two row-gathers + two
column-gathers per image instead of a 2-D gather over H*W*4 corners.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_aug_params(key, boxes, counts, sizes, drift_prob, flip_prob):
    """Per-image augmentation draws, mirroring host drift()/flip() bounds.

    dy in [-H//4, min(H//4, min_box_y)), dx in [-W//8, min(W//8, min_box_x))
    (reference src/utils/image.py:22-38); images with no valid boxes drift
    freely. Returns dict of (B,) arrays {dy, dx, flip}.

    :param boxes: (B, M, 4) padded xyxy GT; ``counts``: (B,) valid slots.
    :param sizes: (B, 2) original (H, W).
    """
    b = boxes.shape[0]
    k_drift, k_dy, k_dx, k_flip = jax.random.split(key, 4)

    max_dy = sizes[:, 0] // 4
    max_dx = sizes[:, 1] // 8
    slot_valid = jnp.arange(boxes.shape[1])[None, :] < counts[:, None]
    big = jnp.float32(1e9)
    min_box_y = jnp.min(
        jnp.where(slot_valid, boxes[..., 1], big), axis=1
    )
    min_box_x = jnp.min(
        jnp.where(slot_valid, boxes[..., 0], big), axis=1
    )
    has_boxes = counts > 0
    # np.random.randint truncates float bounds toward zero; boxes are >= 0
    # so floor == trunc here
    hi_y = jnp.where(
        has_boxes, jnp.minimum(max_dy, min_box_y.astype(jnp.int32)), max_dy
    )
    hi_x = jnp.where(
        has_boxes, jnp.minimum(max_dx, min_box_x.astype(jnp.int32)), max_dx
    )
    # randint requires hi > lo; degenerate only if H < 4 (never for KITTI)
    hi_y = jnp.maximum(hi_y, -max_dy + 1)
    hi_x = jnp.maximum(hi_x, -max_dx + 1)

    dy = jax.random.randint(k_dy, (b,), -max_dy, hi_y)
    dx = jax.random.randint(k_dx, (b,), -max_dx, hi_x)
    do_drift = jax.random.uniform(k_drift, (b,)) < drift_prob
    dy = jnp.where(do_drift, dy, 0).astype(jnp.int32)
    dx = jnp.where(do_drift, dx, 0).astype(jnp.int32)
    do_flip = jax.random.uniform(k_flip, (b,)) < flip_prob
    return {"dy": dy, "dx": dx, "flip": do_flip}


def sample_erase_params(key, batch, out_size, area_range=(0.02, 0.2),
                        aspect_range=(0.3, 1.0 / 0.3)):
    """Per-image random-erasing draws (Zhong et al. 2017 recipe).

    Device twin of core/image.py random_erase: target area fraction
    ~ U(area_range), aspect ratio ~ logU(aspect_range), position uniform
    over placements keeping the rect inside the image. Returns dict of
    (B,) int32 arrays {ey, ex, eh, ew}; a zero eh/ew disables the erase
    for that image (the caller gates on the erase probability).
    """
    oh, ow = out_size
    k_s, k_r, k_y, k_x = jax.random.split(key, 4)
    s = jax.random.uniform(
        k_s, (batch,), minval=area_range[0], maxval=area_range[1]
    ) * (oh * ow)
    logr = jax.random.uniform(
        k_r, (batch,),
        minval=jnp.log(aspect_range[0]), maxval=jnp.log(aspect_range[1]),
    )
    r = jnp.exp(logr)
    eh = jnp.minimum(jnp.round(jnp.sqrt(s * r)), oh).astype(jnp.int32)
    ew = jnp.minimum(jnp.round(jnp.sqrt(s / r)), ow).astype(jnp.int32)
    ey = jnp.floor(
        jax.random.uniform(k_y, (batch,)) * (oh - eh + 1)
    ).astype(jnp.int32)
    ex = jnp.floor(
        jax.random.uniform(k_x, (batch,)) * (ow - ew + 1)
    ).astype(jnp.int32)
    return {"ey": ey, "ex": ex, "eh": eh, "ew": ew}


def apply_erase(images, erase, on, fill):
    """Fill each image's erase rect with ``fill`` ((3,) raw-space RGB).

    ``on``: (B,) bool — images drawn below the erase probability pass
    through untouched. Static-shape: the rect is realized as a broadcasted
    iota mask, so XLA fuses the select into the surrounding elementwise
    chain instead of emitting a dynamic-update-slice per image.
    """
    h, w = images.shape[1], images.shape[2]
    ys = jnp.arange(h)[None, :, None]
    xs = jnp.arange(w)[None, None, :]
    ey = erase["ey"][:, None, None]
    ex = erase["ex"][:, None, None]
    iny = (ys >= ey) & (ys < ey + erase["eh"][:, None, None])
    inx = (xs >= ex) & (xs < ex + erase["ew"][:, None, None])
    mask = (iny & inx & on[:, None, None])[..., None]
    return jnp.where(mask, jnp.asarray(fill, images.dtype), images)


def _warp_one(image, hw, dy, dx, do_flip, out_size, pad_value):
    """Drift+flip+resize one (Hs, Ws, 3) image (any dtype) to float32
    ``out_size``; ``hw`` is the valid (H, W) region inside the storage."""
    hs, ws = image.shape[0], image.shape[1]
    oh, ow = out_size
    h = (hw[0] - dy).astype(jnp.float32)  # drifted canvas size
    w = (hw[1] - dx).astype(jnp.float32)

    # cv2-convention resize sample coordinates in the drifted canvas,
    # clamped (border replicate), then translated into original coords
    fy = jnp.clip((jnp.arange(oh) + 0.5) * (h / oh) - 0.5, 0.0, h - 1.0)
    fx = jnp.clip((jnp.arange(ow) + 0.5) * (w / ow) - 0.5, 0.0, w - 1.0)
    fx = jnp.where(do_flip, (w - 1.0) - fx, fx)
    ry = fy + dy
    rx = fx + dx

    y0 = jnp.floor(ry)
    wy = (ry - y0)[:, None, None]
    x0 = jnp.floor(rx)
    wx = (rx - x0)[None, :, None]
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    def rows(yi):
        valid = (yi >= 0) & (yi < hw[0])
        r = jnp.take(image, jnp.clip(yi, 0, hs - 1), axis=0).astype(jnp.float32)
        return jnp.where(valid[:, None, None], r, pad_value)

    v = (1.0 - wy) * rows(y0) + wy * rows(y0 + 1)  # (oh, Ws, 3)

    def cols(xi):
        valid = (xi >= 0) & (xi < hw[1])
        c = jnp.take(v, jnp.clip(xi, 0, ws - 1), axis=1)
        return jnp.where(valid[None, :, None], c, pad_value)

    return (1.0 - wx) * cols(x0) + wx * cols(x0 + 1)  # (oh, ow, 3)


def warp_batch(images, sizes, aug, out_size, pad_value):
    """vmapped drift+flip+resize; ``images`` (B, Hs, Ws, 3) any dtype,
    ``pad_value`` (3,) raw-space RGB fill (the dataset mean)."""
    return jax.vmap(
        lambda im, hw, dy, dx, fl: _warp_one(
            im, hw, dy, dx, fl, out_size, pad_value
        )
    )(images, sizes, aug["dy"], aug["dx"], aug["flip"])


def transform_boxes(boxes, sizes, aug, out_size):
    """Apply the same drift/flip/resize to padded GT boxes (B, M, 4 xyxy).

    Mirrors host drift (shift), flip (mirror at drifted width with the
    inclusive-pixel convention, core/image.py:118-122) and resize (scale).
    """
    oh, ow = out_size
    dy = aug["dy"][:, None].astype(jnp.float32)
    dx = aug["dx"][:, None].astype(jnp.float32)
    h = sizes[:, 0:1].astype(jnp.float32) - dy
    w = sizes[:, 1:2].astype(jnp.float32) - dx

    x1 = boxes[..., 0] - dx
    y1 = boxes[..., 1] - dy
    x2 = boxes[..., 2] - dx
    y2 = boxes[..., 3] - dy

    flip = aug["flip"][:, None]
    widths = x2 - x1
    fx1 = (w - 1.0) - x2
    x1 = jnp.where(flip, fx1, x1)
    x2 = jnp.where(flip, fx1 + widths, x2)

    sx = ow / w
    sy = oh / h
    return jnp.stack([x1 * sx, y1 * sy, x2 * sx, y2 * sy], axis=-1)
