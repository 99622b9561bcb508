#!/usr/bin/env python
"""Hard synthetic KITTI-format dataset generator (the real-data proxy).

The real KITTI 2D dataset and the reference's trained checkpoints are not
obtainable in this environment (zero egress — verified 2026-08-16: HTTP 000
from the KITTI S3 bucket; `/root/reference/data/kitti/` contains only empty
directories, see `.MISSING_LARGE_BLOBS`). This generator builds the
strongest available proxy: a procedurally rendered street-scene dataset
whose LABEL STATISTICS match the published real-KITTI ones, hard enough
that mAP does not saturate (the round-1 200-image set hit Car AP 1.000).

What makes it hard / realistic (each mapped to a real-KITTI property):

- **Perspective ground plane.** Object image height h ~ f*H/d for distance
  d ~ reciprocal(5.5m, 90m), f=720px — reproducing KITTI's long-tailed
  height distribution (most objects 15-80 px, MIN_HEIGHT gates at 40/25/25)
  and the y-position/size correlation real detectors exploit.
- **Occlusion by geometry.** Objects render far-to-near (painter's
  algorithm); per-object occlusion is measured from actual covered pixels
  and binned to KITTI's 0/1/2 levels (MAX_OCCLUSION gates 0/1/2).
- **Truncation at image edges.** Lateral placement lets boxes cross the
  frame; truncation = clipped fraction (MAX_TRUNCATION gates .15/.3/.5).
- **Class mix** Car:Pedestrian:Cyclist ~ 0.72:0.18:0.10 (real: ~0.79:0.12:
  0.045 among the three scored classes; Ped/Cyc are slightly oversampled so
  their AP estimates have acceptable variance on a few-thousand-image set).
- **Neighbor classes + DontCare.** Unlabeled-as-scored 'Van' objects (drawn
  like cars) and 'DontCare' regions over distant clutter exercise the
  devkit's neighbor-class / DontCare ignore logic — detections on them must
  not count as FPs for the evaluator to agree with real-KITTI behaviour.
- **Clutter & nuisance.** Buildings, windows, trees, poles, lane markings,
  shadows, per-object color/shading jitter, global illumination shifts,
  sensor noise and slight blur keep appearance from being linearly
  separable; distractor rectangles share car-like statistics.
- **Class confusability.** Cyclists are rendered as a rider torso over two
  wheels; pedestrians as articulated thin figures — at 25 px they are
  genuinely confusable, which is where real KITTI loses its AP.

Objects per image ~ shifted-Poisson (mean ~5.6, up to 14 labeled), matching
KITTI's ~5.3 labeled objects/image.

Usage:
    python tools/make_synthetic_kitti.py <out_dir> [--n_train 3500]
        [--n_val 1000] [--seed 0]

Writes <out_dir>/kitti/{training/{image_2,label_2},image_sets}. Point
`--data_dir <out_dir>` at it. ~150 KB/image PNG.
"""

from __future__ import annotations

import argparse
import os

import cv2
import numpy as np

W, H = 1242, 375
FOCAL = 720.0
HORIZON = 172.0
CAM_H = 1.65  # camera height above ground (m)

# class -> (real height m (lo, hi), aspect w/h (lo, hi))
CLASS_GEOM = {
    "Car": ((1.35, 1.75), (1.6, 3.4)),
    "Van": ((1.8, 2.4), (1.3, 2.6)),
    "Pedestrian": ((1.55, 1.9), (0.28, 0.55)),
    "Cyclist": ((1.55, 1.85), (0.55, 1.05)),
}
CLASS_P = {"Car": 0.66, "Pedestrian": 0.17, "Cyclist": 0.09, "Van": 0.08}


def _ground_y(d):
    """Image y of the ground plane at distance d."""
    return HORIZON + FOCAL * CAM_H / d


def _color(rng, base, jitter=30):
    c = np.clip(np.asarray(base, np.int32) + rng.integers(-jitter, jitter, 3), 0, 255)
    return tuple(int(v) for v in c)


def _draw_background(img, rng):
    # sky gradient
    sky_top = _color(rng, (180, 190, 210), 40)
    sky_bot = _color(rng, (205, 210, 220), 30)
    for y in range(int(HORIZON)):
        t = y / HORIZON
        img[y] = [int(a * (1 - t) + b * t) for a, b in zip(sky_top, sky_bot)]
    # ground / road
    ground = _color(rng, (120, 118, 112), 25)
    img[int(HORIZON):] = ground
    road = _color(rng, (95, 95, 98), 18)
    vp = (int(W / 2 + rng.integers(-150, 150)), int(HORIZON))
    half_w = rng.integers(350, 620)
    pts = np.array([[vp[0] - 18, vp[1]], [vp[0] + 18, vp[1]],
                    [W // 2 + half_w, H], [W // 2 - half_w, H]])
    cv2.fillConvexPoly(img, pts, road)
    # lane markings
    for k in range(rng.integers(2, 6)):
        t0 = rng.uniform(0.15, 0.9)
        p0 = (int(vp[0] + (W // 2 - vp[0]) * t0), int(vp[1] + (H - vp[1]) * t0))
        p1 = (int(vp[0] + (W // 2 - vp[0]) * (t0 + 0.08)),
              int(vp[1] + (H - vp[1]) * (t0 + 0.08)))
        cv2.line(img, p0, p1, (230, 230, 230), max(1, int(3 * t0)))
    # buildings with windows (hard clutter: rectangular, car-colored)
    for _ in range(rng.integers(3, 9)):
        bw = rng.integers(60, 260)
        bh = rng.integers(40, 170)
        bx = rng.integers(-40, W - 20)
        by = int(HORIZON) - bh + rng.integers(-8, 8)
        col = _color(rng, (130, 125, 120), 45)
        cv2.rectangle(img, (bx, by), (bx + bw, int(HORIZON) + rng.integers(0, 12)), col, -1)
        wc = _color(rng, (80, 85, 95), 25)
        for wx in range(bx + 8, bx + bw - 10, 22):
            for wy in range(by + 8, int(HORIZON) - 10, 26):
                cv2.rectangle(img, (wx, wy), (wx + 10, wy + 14), wc, -1)
    # trees / bushes
    for _ in range(rng.integers(2, 7)):
        tx = rng.integers(0, W)
        ty = int(HORIZON) + rng.integers(-15, 10)
        r = rng.integers(12, 45)
        cv2.circle(img, (tx, ty - r), r, _color(rng, (60, 110, 70), 30), -1)
        cv2.rectangle(img, (tx - 3, ty - r), (tx + 3, ty + 6),
                      _color(rng, (70, 60, 50), 15), -1)
    # poles
    for _ in range(rng.integers(1, 5)):
        px = rng.integers(0, W)
        ph = rng.integers(30, 90)
        cv2.rectangle(img, (px, int(HORIZON) - ph), (px + 3, int(_ground_y(rng.uniform(8, 30)))),
                      _color(rng, (90, 90, 90), 20), -1)


def _draw_car(img, x1, y1, x2, y2, rng, is_van=False):
    w, h = x2 - x1, y2 - y1
    body = _color(rng, rng.choice([(70, 70, 75), (140, 20, 20), (20, 30, 120),
                                   (160, 160, 165), (200, 200, 205), (30, 90, 40)],
                                  p=[0.3, 0.12, 0.14, 0.22, 0.14, 0.08]), 28)
    roof_h = int(h * (0.42 if not is_van else 0.12))
    # body
    cv2.rectangle(img, (x1, y1 + roof_h), (x2, y2), body, -1)
    # cabin / roof (inset for cars, full for vans)
    inset = int(w * (0.16 if not is_van else 0.03))
    cv2.rectangle(img, (x1 + inset, y1), (x2 - inset, y1 + roof_h + 2),
                  tuple(int(v * 0.92) for v in body), -1)
    # windows
    wc = _color(rng, (60, 75, 90), 18)
    cv2.rectangle(img, (x1 + inset + 2, y1 + 2), (x2 - inset - 2, y1 + roof_h - 1), wc, -1)
    # wheels
    wr = max(1, int(h * 0.14))
    wheel = (25, 25, 28)
    cv2.circle(img, (x1 + int(w * 0.22), y2 - wr + 1), wr, wheel, -1)
    cv2.circle(img, (x2 - int(w * 0.22), y2 - wr + 1), wr, wheel, -1)
    # lights / shading
    if w > 14:
        cv2.rectangle(img, (x1 + 1, y1 + roof_h + 2), (x1 + 3, y1 + roof_h + 5), (230, 220, 180), -1)
        shade = np.zeros_like(img[y1 + roof_h:y2, x1:x2])
        shade[:, : w // 2] = 12
        img[y1 + roof_h:y2, x1:x2] = cv2.subtract(img[y1 + roof_h:y2, x1:x2], shade)


def _draw_pedestrian(img, x1, y1, x2, y2, rng):
    w, h = x2 - x1, y2 - y1
    cx = (x1 + x2) // 2
    skin = _color(rng, (190, 160, 140), 30)
    shirt = _color(rng, rng.choice([(150, 40, 40), (40, 60, 140), (60, 60, 60),
                                    (150, 140, 60)]), 35)
    pants = _color(rng, (45, 45, 70), 25)
    hr = max(1, int(h * 0.12))
    cv2.circle(img, (cx, y1 + hr), hr, skin, -1)  # head
    t_top, t_bot = y1 + 2 * hr, y1 + int(h * 0.55)
    cv2.rectangle(img, (x1 + 1, t_top), (x2 - 1, t_bot), shirt, -1)  # torso
    # legs (walking pose)
    spread = rng.integers(0, max(2, w // 2))
    cv2.line(img, (cx, t_bot), (cx - spread, y2), pants, max(1, w // 3))
    cv2.line(img, (cx, t_bot), (cx + spread, y2), pants, max(1, w // 3))
    # arms
    cv2.line(img, (cx, t_top + 2), (x1, (t_top + t_bot) // 2), shirt, max(1, w // 4))
    cv2.line(img, (cx, t_top + 2), (x2, (t_top + t_bot) // 2), shirt, max(1, w // 4))


def _draw_cyclist(img, x1, y1, x2, y2, rng):
    w, h = x2 - x1, y2 - y1
    wr = max(2, int(h * 0.22))
    wy = y2 - wr
    frame = _color(rng, (40, 40, 45), 20)
    cv2.circle(img, (x1 + wr, wy), wr, frame, max(1, h // 20))
    cv2.circle(img, (x2 - wr, wy), wr, frame, max(1, h // 20))
    cv2.line(img, (x1 + wr, wy), (x2 - wr, wy), frame, max(1, h // 16))
    cv2.line(img, (x1 + wr, wy), ((x1 + x2) // 2, y1 + int(h * 0.38)), frame, max(1, h // 16))
    # rider
    rx1 = x1 + int(w * 0.25)
    rx2 = x2 - int(w * 0.2)
    _draw_pedestrian(img, rx1, y1, rx2, y1 + int(h * 0.62), rng)


_DRAW = {"Car": _draw_car, "Van": lambda *a: _draw_car(*a, is_van=True),
         "Pedestrian": _draw_pedestrian, "Cyclist": _draw_cyclist}


def generate_image(rng):
    """Render one scene; returns (image BGR uint8, kitti label lines)."""
    img = np.empty((H, W, 3), np.uint8)
    _draw_background(img, rng)

    # sample objects on the ground plane
    n_obj = int(np.clip(rng.poisson(5.4) + 1, 1, 15))
    classes = list(CLASS_P)
    probs = np.array([CLASS_P[c] for c in classes])
    objs = []
    for _ in range(n_obj):
        cls = classes[rng.choice(len(classes), p=probs)]
        (h_lo, h_hi), (a_lo, a_hi) = CLASS_GEOM[cls]
        # log-uniform distance: car height px median ~42, ~16% below the
        # 25 px hard gate, ~53% above the 40 px easy gate — the published
        # real-KITTI long tail
        d = float(np.exp(rng.uniform(np.log(7.0), np.log(100.0))))
        h_real = rng.uniform(h_lo, h_hi)
        h_px = FOCAL * h_real / d
        if h_px < 8:  # too small for even the devkit's hard gate to matter
            continue
        w_px = h_px * rng.uniform(a_lo, a_hi)
        y2 = _ground_y(d) + rng.normal(0, 2.0)
        # lateral: mostly in frame, some crossing edges (truncation);
        # traffic clusters (queues / parked rows) drive realistic occlusion
        if objs and rng.random() < 0.45:
            anchor = objs[rng.integers(0, len(objs))]
            ax1, _, ax2, _ = anchor["box"]
            cx = (ax1 + ax2) / 2 + rng.normal(0, max(w_px, ax2 - ax1))
        else:
            cx = rng.uniform(-0.06 * W, 1.06 * W)
        x1, x2 = cx - w_px / 2, cx + w_px / 2
        y1 = y2 - h_px
        objs.append(dict(cls=cls, d=d, box=[x1, y1, x2, y2]))

    objs.sort(key=lambda o: -o["d"])  # far -> near (painter's algorithm)

    # DontCare clutter: very distant vehicle-ish blobs near the horizon
    dontcare = []
    for _ in range(rng.integers(0, 3)):
        d = rng.uniform(70, 160)
        h_px = FOCAL * 1.5 / d
        w_px = h_px * rng.uniform(1.8, 3.0)
        cx = rng.uniform(0, W)
        y2 = _ground_y(d)
        x1, y1, x2 = cx - w_px / 2, y2 - h_px, cx + w_px / 2
        cv2.rectangle(img, (int(x1), int(y1)), (int(x2), int(y2)),
                      _color(rng, (100, 100, 105), 30), -1)
        c = [max(0, x1), max(0, y1), min(W - 1, x2), min(H - 1, y2)]
        if c[2] > c[0] + 2 and c[3] > c[1] + 2:
            dontcare.append(c)

    # render + occlusion bookkeeping via an ownership mask
    owner = np.full((H, W), -1, np.int16)
    vis_px = []
    for i, o in enumerate(objs):
        x1, y1, x2, y2 = o["box"]
        xi1, yi1 = int(max(0, round(x1))), int(max(0, round(y1)))
        xi2, yi2 = int(min(W - 1, round(x2))), int(min(H - 1, round(y2)))
        if xi2 - xi1 < 2 or yi2 - yi1 < 3:
            o["drop"] = True
            vis_px.append(0)
            continue
        o["drop"] = False
        o["clip"] = [xi1, yi1, xi2, yi2]
        _DRAW[o["cls"]](img, xi1, yi1, xi2, yi2, rng)
        owner[yi1:yi2 + 1, xi1:xi2 + 1] = i
        vis_px.append(0)

    counts = np.bincount(owner[owner >= 0].ravel(), minlength=len(objs))

    lines = []
    for i, o in enumerate(objs):
        if o["drop"]:
            continue
        x1, y1, x2, y2 = o["box"]
        xi1, yi1, xi2, yi2 = o["clip"]
        full_area = (x2 - x1) * (y2 - y1)
        clip_area = (xi2 - xi1 + 1) * (yi2 - yi1 + 1)
        trunc = float(np.clip(1.0 - clip_area / max(full_area, 1e-6), 0, 0.95))
        occ_frac = 1.0 - counts[i] / max(clip_area, 1)
        if occ_frac > 0.85:  # essentially invisible: real KITTI marks DontCare
            if clip_area > 16:
                dontcare.append([xi1, yi1, xi2, yi2])
            continue
        occ = 0 if occ_frac < 0.15 else (1 if occ_frac < 0.5 else 2)
        lines.append(
            f"{o['cls']} {trunc:.2f} {occ} 0.00 "
            f"{xi1:.2f} {yi1:.2f} {xi2:.2f} {yi2:.2f} "
            "0.00 0.00 0.00 0.00 0.00 0.00 0.00\n"
        )
    for c in dontcare:
        lines.append(
            f"DontCare -1 -1 -10 {c[0]:.2f} {c[1]:.2f} {c[2]:.2f} {c[3]:.2f} "
            "-1 -1 -1 -1000 -1000 -1000 -10\n"
        )

    # global nuisance: illumination, shadows, blur, sensor noise
    if rng.random() < 0.5:
        sx = rng.integers(0, W - 100)
        sw = rng.integers(80, 400)
        img[int(HORIZON):, sx:sx + sw] = (
            img[int(HORIZON):, sx:sx + sw].astype(np.int16) - rng.integers(10, 35)
        ).clip(0, 255).astype(np.uint8)
    gain = rng.uniform(0.75, 1.2)
    bias = rng.integers(-18, 18)
    img = (img.astype(np.float32) * gain + bias).clip(0, 255).astype(np.uint8)
    if rng.random() < 0.35:
        img = cv2.GaussianBlur(img, (3, 3), 0)
    noise = rng.normal(0, rng.uniform(2, 7), img.shape)
    img = (img.astype(np.float32) + noise).clip(0, 255).astype(np.uint8)
    return img, lines


def generate(out_dir, n_train=3500, n_val=1000, seed=0, start_index=0):
    kitti = os.path.join(out_dir, "kitti")
    os.makedirs(os.path.join(kitti, "image_sets"), exist_ok=True)
    os.makedirs(os.path.join(kitti, "training", "image_2"), exist_ok=True)
    os.makedirs(os.path.join(kitti, "training", "label_2"), exist_ok=True)

    n = n_train + n_val
    ids = [f"{start_index + i:06d}" for i in range(n)]
    for i, fid in enumerate(ids):
        img_path = os.path.join(kitti, "training", "image_2", fid + ".png")
        lbl_path = os.path.join(kitti, "training", "label_2", fid + ".txt")
        if os.path.exists(img_path) and os.path.exists(lbl_path):
            continue  # resumable: every frame's rng is seeded by its index
        rng = np.random.default_rng(seed * 1_000_003 + start_index + i)
        img, lines = generate_image(rng)
        cv2.imwrite(img_path, img)
        with open(lbl_path, "w") as fp:
            fp.writelines(lines)
        if (i + 1) % 250 == 0:
            print(f"{i + 1}/{n} images", flush=True)

    with open(os.path.join(kitti, "image_sets", "train.txt"), "w") as fp:
        fp.writelines(f"{i}\n" for i in ids[:n_train])
    with open(os.path.join(kitti, "image_sets", "val.txt"), "w") as fp:
        fp.writelines(f"{i}\n" for i in ids[n_train:])
    with open(os.path.join(kitti, "image_sets", "trainval.txt"), "w") as fp:
        fp.writelines(f"{i}\n" for i in ids)
    return kitti


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--n_train", type=int, default=3500)
    ap.add_argument("--n_val", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    kitti = generate(args.out_dir, args.n_train, args.n_val, args.seed)
    print(f"wrote {kitti}")


if __name__ == "__main__":
    main()
