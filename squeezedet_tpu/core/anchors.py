"""Anchor grid generation.

The anchor layout is load-bearing: the ConvDet head's NHWC output is reshaped
to ``(B, H*W*K, C+5)``, so anchor index ``a = (h*W + w)*K + k`` must address
the anchor of seed ``k`` centred in grid cell ``(h, w)``. Centres sit at
``(i + 0.5) * stride`` for stride = input/grid (reference
src/utils/boxes.py:37-67; KITTI grid 24x78, 9 seeds -> 16,848 anchors,
reference src/datasets/kitti.py:26-32).
"""

from __future__ import annotations

import numpy as np


def generate_anchors(
    grid_size: tuple[int, int],
    input_size: tuple[int, int],
    anchors_seed: np.ndarray,
) -> np.ndarray:
    """Build the dense anchor grid.

    :param grid_size: (grid_h, grid_w) — spatial shape of the head output.
    :param input_size: (height, width) of the network input.
    :param anchors_seed: (K, 2) array of (w, h) anchor shapes.
    :return: (grid_h * grid_w * K, 4) float32 anchors in xywh format,
        ordered h-major, then w, then seed index.
    """
    anchors_seed = np.asarray(anchors_seed, dtype=np.float32)
    assert anchors_seed.ndim == 2 and anchors_seed.shape[1] == 2
    grid_h, grid_w = grid_size
    input_h, input_w = input_size
    num_seeds = anchors_seed.shape[0]

    # Cell centres: (i + 0.5) * stride along each axis.
    cx = (np.arange(grid_w, dtype=np.float64) + 0.5) * (input_w / grid_w)
    cy = (np.arange(grid_h, dtype=np.float64) + 0.5) * (input_h / grid_h)

    centers = np.empty((grid_h, grid_w, 2), dtype=np.float64)
    centers[..., 0] = cx[None, :]
    centers[..., 1] = cy[:, None]

    anchors = np.empty((grid_h, grid_w, num_seeds, 4), dtype=np.float32)
    anchors[..., :2] = centers[:, :, None, :]
    anchors[..., 2:] = anchors_seed[None, None, :, :]
    return anchors.reshape(-1, 4)
