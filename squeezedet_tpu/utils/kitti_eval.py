"""KITTI 2D AP evaluation: native binary wrapper + pure-Python twin.

`run_kitti_eval` drives the C++ evaluator (native/kitti_eval/kitti_eval.cc,
built by its Makefile; auto-built on first use when a toolchain exists) with
the devkit CLI contract. `evaluate_python` is an independent implementation
of the identical protocol used as a fallback and as the cross-validation
oracle in tests — both must produce the same stats files.

Protocol (matching the devkit evaluator the reference bundles,
src/utils/kitti-eval/cpp/evaluate_object.cpp): 41 recall samples, 11-point
AP, per-class min IoU {car .7, pedestrian .5, cyclist .5}, difficulty gates
on height/occlusion/truncation, neighbour-class and DontCare ignore rules,
orientation similarity (AOS).
"""

from __future__ import annotations

import math
import os
import subprocess
from dataclasses import dataclass, field

import numpy as np

N_SAMPLE_PTS = 41
CLASS_NAMES = ("car", "pedestrian", "cyclist")
MIN_OVERLAP = (0.7, 0.5, 0.5)
MIN_HEIGHT = (40, 25, 25)
MAX_OCCLUSION = (0, 1, 2)
MAX_TRUNCATION = (0.15, 0.30, 0.50)

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "kitti_eval",
)
_NATIVE_BIN = os.path.join(_NATIVE_DIR, "kitti_eval")


def native_binary() -> str | None:
    """Path to the built evaluator, (re)building as needed.

    Always runs make — a no-op when the binary is newer than the source,
    but a stale binary from before a kitti_eval.cc change would otherwise
    keep scoring with old semantics forever."""
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
        )
    except Exception:
        pass  # no toolchain: fall through to whatever binary exists
    return _NATIVE_BIN if os.path.exists(_NATIVE_BIN) else None


def run_kitti_eval(
    gt_dir: str,
    image_set_path: str,
    results_dir: str,
    num_images: int,
    force_python: bool = False,
) -> None:
    """Evaluate `results_dir/data/*.txt` against `gt_dir/label_2/*.txt`,
    writing stats_* files into `results_dir`."""
    binary = None if force_python else native_binary()
    if binary is not None:
        subprocess.run(
            [binary, gt_dir, image_set_path, results_dir, str(num_images)],
            check=True,
        )
        return
    evaluate_python(gt_dir, image_set_path, results_dir, num_images)


# -- pure-Python implementation ---------------------------------------------


@dataclass
class _Obj:
    type: str
    box: np.ndarray  # x1 y1 x2 y2
    alpha: float = -10.0
    truncation: float = -1.0
    occlusion: int = -1
    score: float = -1e9


def _load_gt(path: str) -> list[_Obj]:
    objs = []
    with open(path) as fp:
        for line in fp:
            f = line.split()
            if len(f) < 15:
                continue
            objs.append(
                _Obj(
                    type=f[0],
                    truncation=float(f[1]),
                    occlusion=int(float(f[2])),
                    alpha=float(f[3]),
                    box=np.array([float(v) for v in f[4:8]]),
                )
            )
    return objs


def _load_det(path: str) -> list[_Obj]:
    objs = []
    with open(path) as fp:
        for line in fp:
            f = line.split()
            if len(f) < 16:
                continue
            objs.append(
                _Obj(
                    type=f[0],
                    alpha=float(f[3]),
                    box=np.array([float(v) for v in f[4:8]]),
                    score=float(f[15]),
                )
            )
    return objs


def _overlap(a: np.ndarray, b: np.ndarray, criterion: int = -1) -> float:
    w = min(a[2], b[2]) - max(a[0], b[0])
    h = min(a[3], b[3]) - max(a[1], b[1])
    if w <= 0 or h <= 0:
        return 0.0
    inter = w * h
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    if criterion == 0:
        return inter / area_a
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    return inter / (area_a + area_b - inter)


def _clean_frame(cls, difficulty, gt, det):
    gt_flags, dontcare = [], []
    n_counted = 0
    for g in gt:
        t = g.type.lower()
        if t == CLASS_NAMES[cls]:
            relation = 1
        elif cls == 1 and t == "person_sitting":
            relation = 0
        elif cls == 0 and t == "van":
            relation = 0
        else:
            relation = -1

        height = g.box[3] - g.box[1]
        hard_enough = (
            g.occlusion <= MAX_OCCLUSION[difficulty]
            and g.truncation <= MAX_TRUNCATION[difficulty]
            and height >= MIN_HEIGHT[difficulty]
        )
        if relation == 1 and hard_enough:
            gt_flags.append(0)
            n_counted += 1
        elif relation in (0, 1):
            gt_flags.append(1)
        else:
            gt_flags.append(-1)

        if t == "dontcare":
            dontcare.append(g.box)

    det_flags = [0 if d.type.lower() == CLASS_NAMES[cls] else -1 for d in det]
    return gt_flags, det_flags, dontcare, n_counted


def _match_frame(cls, gt, det, dontcare, gt_flags, det_flags,
                 count_fp, compute_aos, threshold):
    min_ov = MIN_OVERLAP[cls]
    assigned = [False] * len(det)
    below = [count_fp and d.score < threshold for d in det]

    tp = fp = fn = 0
    tp_scores: list[float] = []
    deltas: list[float] = []

    for i, g in enumerate(gt):
        if gt_flags[i] == -1:
            continue
        best = -1
        found = False
        best_score = -math.inf
        best_overlap = 0.0
        for j, d in enumerate(det):
            if det_flags[j] == -1 or assigned[j] or below[j]:
                continue
            ov = _overlap(d.box, g.box)
            if ov <= min_ov:
                continue
            if not count_fp:
                if d.score > best_score:
                    best, best_score, found = j, d.score, True
            elif det_flags[j] == 0 and ov > best_overlap:
                best_overlap, best, found = ov, j, True

        if not found:
            if gt_flags[i] == 0:
                fn += 1
        elif gt_flags[i] == 1:
            assigned[best] = True
        else:
            tp += 1
            tp_scores.append(det[best].score)
            if compute_aos:
                deltas.append(g.alpha - det[best].alpha)
            assigned[best] = True

    similarity = 0.0
    if count_fp:
        for j, d in enumerate(det):
            if not assigned[j] and det_flags[j] == 0 and not below[j]:
                fp += 1
        absorbed = 0
        for dc in dontcare:
            for j, d in enumerate(det):
                if assigned[j] or det_flags[j] != 0 or below[j]:
                    continue
                if _overlap(d.box, dc, 0) > min_ov:
                    assigned[j] = True
                    absorbed += 1
        fp -= absorbed
        if compute_aos:
            sim = sum((1.0 + math.cos(x)) / 2.0 for x in deltas)
            similarity = sim if (tp > 0 or fp > 0) else -1.0

    return tp, fp, fn, tp_scores, similarity


def _recall_thresholds(scores: list[float], n_gt: int) -> list[float]:
    scores = sorted(scores, reverse=True)
    out: list[float] = []
    current = 0.0
    for i, s in enumerate(scores):
        left = (i + 1) / n_gt
        right = (i + 2) / n_gt if i < len(scores) - 1 else left
        if (right - current) < (current - left) and i < len(scores) - 1:
            continue
        out.append(s)
        current += 1.0 / (N_SAMPLE_PTS - 1.0)
    return out


def _eval_class_difficulty(cls, difficulty, gts, dets, compute_aos):
    n_gt = 0
    per_frame = []
    all_scores: list[float] = []
    for gt, det in zip(gts, dets):
        gt_flags, det_flags, dontcare, counted = _clean_frame(
            cls, difficulty, gt, det
        )
        n_gt += counted
        per_frame.append((gt_flags, det_flags, dontcare))
        _, _, _, scores, _ = _match_frame(
            cls, gt, det, dontcare, gt_flags, det_flags, False, False, 0.0
        )
        all_scores.extend(scores)

    thresholds = _recall_thresholds(all_scores, n_gt)

    precision = np.zeros(N_SAMPLE_PTS)
    aos = np.zeros(N_SAMPLE_PTS)
    agg = np.zeros((len(thresholds), 4))  # tp, fp, fn, similarity
    for (gt, det), (gt_flags, det_flags, dontcare) in zip(
        zip(gts, dets), per_frame
    ):
        for t, thr in enumerate(thresholds):
            tp, fp, fn, _, sim = _match_frame(
                cls, gt, det, dontcare, gt_flags, det_flags, True,
                compute_aos, thr,
            )
            agg[t, 0] += tp
            agg[t, 1] += fp
            agg[t, 2] += fn
            if sim != -1:
                agg[t, 3] += sim

    for t in range(len(thresholds)):
        # tp+fp can be 0 when every above-threshold det was absorbed by
        # ignored GT / DontCare; 0/0 would poison the right-max
        # monotonicisation below with NaN
        denom = agg[t, 0] + agg[t, 1]
        precision[t] = agg[t, 0] / denom if denom > 0 else 0.0
        if compute_aos:
            aos[t] = agg[t, 3] / denom if denom > 0 else 0.0
    for t in range(len(thresholds)):
        precision[t] = precision[t:].max()
        if compute_aos:
            aos[t] = aos[t:].max()
    return precision, aos


def _format_ap(ap: float) -> str:
    """C++ ostringstream default formatting: 6 significant digits."""
    return f"{ap:.6g}"


def evaluate_python(
    gt_dir: str, image_set_path: str, results_dir: str, num_images: int
) -> None:
    with open(image_set_path) as fp:
        ids = [line.strip() for line in fp if line.strip()]
    assert len(ids) == num_images, (len(ids), num_images)

    gts = [_load_gt(os.path.join(gt_dir, "label_2", i + ".txt")) for i in ids]
    dets = [
        _load_det(os.path.join(results_dir, "data", i + ".txt")) for i in ids
    ]

    compute_aos = all(d.alpha != -10 for frame in dets for d in frame)
    seen = {d.type.lower() for frame in dets for d in frame}

    plot_dir = os.path.join(results_dir, "plot")
    os.makedirs(plot_dir, exist_ok=True)

    for cls, name in enumerate(CLASS_NAMES):
        if name not in seen:
            # a previous eval into the same results_dir may have written
            # stats for this class; a stale file would be parsed as THIS
            # run's AP (inflating mAP and best-model selection)
            for suffix in ("detection", "ap", "orientation"):
                path = os.path.join(results_dir, f"stats_{name}_{suffix}.txt")
                if os.path.exists(path):
                    os.remove(path)
            continue
        det_lines, ap_lines, ori_lines = [], [], []
        curves = []
        for difficulty in range(3):
            precision, aos = _eval_class_difficulty(
                cls, difficulty, gts, dets, compute_aos
            )
            curves.append((precision, aos))
            samples = precision[::4]
            assert len(samples) == 11
            det_lines.append(" ".join(f"{p:f}" for p in samples) + " ")
            ap_lines.append(f"AP={_format_ap(samples.mean())}")
            if compute_aos:
                ori_lines.append(" ".join(f"{a:f}" for a in aos) + " ")

        with open(os.path.join(results_dir, f"stats_{name}_detection.txt"), "w") as fp:
            fp.write("\n".join(det_lines) + "\n")
        with open(os.path.join(results_dir, f"stats_{name}_ap.txt"), "w") as fp:
            fp.write("\n".join(ap_lines) + "\n")
        if compute_aos:
            with open(
                os.path.join(results_dir, f"stats_{name}_orientation.txt"), "w"
            ) as fp:
                fp.write("\n".join(ori_lines) + "\n")

        with open(os.path.join(plot_dir, f"{name}_detection.txt"), "w") as fp:
            for i in range(N_SAMPLE_PTS):
                row = [f"{i / (N_SAMPLE_PTS - 1.0):f}"] + [
                    f"{curves[d][0][i]:f}" for d in range(3)
                ]
                fp.write(" ".join(row) + "\n")
        if compute_aos:  # C++ twin parity: AOS curve data for plot_pr_curves
            with open(
                os.path.join(plot_dir, f"{name}_orientation.txt"), "w"
            ) as fp:
                for i in range(N_SAMPLE_PTS):
                    row = [f"{i / (N_SAMPLE_PTS - 1.0):f}"] + [
                        f"{curves[d][1][i]:f}" for d in range(3)
                    ]
                    fp.write(" ".join(row) + "\n")


def plot_pr_curves(results_dir: str) -> list[str]:
    """Render precision/recall (and AOS) curves from the evaluator's
    plot-data files as PNGs — the matplotlib equivalent of the devkit's
    gnuplot output (reference shells out to gnuplot/ps2pdf,
    src/utils/kitti-eval/cpp/evaluate_object.cpp:583-643)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:  # pragma: no cover
        return []

    plot_dir = os.path.join(results_dir, "plot")
    if not os.path.isdir(plot_dir):
        return []

    written = []
    for name in os.listdir(plot_dir):
        if not name.endswith(".txt"):
            continue
        data = np.loadtxt(os.path.join(plot_dir, name))
        if data.ndim != 2 or data.shape[1] != 4:
            continue
        is_aos = "orientation" in name
        plt.figure(figsize=(4.5, 3.2), dpi=120)
        for col, label in zip((1, 2, 3), ("Easy", "Moderate", "Hard")):
            plt.plot(data[:, 0], data[:, col], label=label)
        plt.xlim(0, 1)
        plt.ylim(0, 1)
        plt.xlabel("Recall")
        plt.ylabel("Orientation Similarity" if is_aos else "Precision")
        plt.title(name.replace(".txt", "").replace("_", " ").title())
        plt.grid(alpha=0.4)
        plt.legend()
        out = os.path.join(plot_dir, name.replace(".txt", ".png"))
        plt.savefig(out, bbox_inches="tight")
        plt.close()
        written.append(out)
    return written


def parse_aps(results_dir: str, class_names=("Car", "Pedestrian", "Cyclist")):
    """Read stats_*_ap.txt files into {class_difficulty: AP} + mAP."""
    aps: dict[str, float] = {}
    for class_name in class_names:
        path = os.path.join(results_dir, f"stats_{class_name.lower()}_ap.txt")
        values = [0.0, 0.0, 0.0]
        if os.path.exists(path):
            with open(path) as fp:
                values = [float(line.split("=")[1]) for line in fp][:3]
        for difficulty, v in zip(("easy", "moderate", "hard"), values):
            aps[f"{class_name}_{difficulty}"] = v
    aps["mAP"] = sum(aps.values()) / len(aps)
    return aps
