import numpy as np

from squeezedet_tpu.core.anchors import generate_anchors

KITTI_SEEDS = np.array(
    [
        [34, 30], [75, 45], [38, 90],
        [127, 68], [80, 174], [196, 97],
        [194, 178], [283, 156], [381, 185],
    ],
    dtype=np.float32,
)


def _reference_formula(grid_size, input_size, seeds):
    """Independent restatement of the reference centre formula
    (linspace-based, src/utils/boxes.py:55-58) for cross-checking."""
    gh, gw = grid_size
    ih, iw = input_size
    cx = iw * (1 / (gw * 2) + np.linspace(0, 1, gw + 1)[:-1])
    cy = ih * (1 / (gh * 2) + np.linspace(0, 1, gh + 1)[:-1])
    mx, my = np.meshgrid(cx, cy)
    centers = np.stack([mx, my], axis=2)  # (gh, gw, 2)
    k = seeds.shape[0]
    out = np.empty((gh, gw, k, 4))
    out[..., :2] = centers[:, :, None, :]
    out[..., 2:] = seeds[None, None]
    return out.reshape(-1, 4)


def test_kitti_anchor_count_and_layout():
    anchors = generate_anchors((24, 78), (384, 1248), KITTI_SEEDS)
    assert anchors.shape == (16848, 4)
    # first cell centre at (stride/2, stride/2) = (8, 8)
    np.testing.assert_allclose(anchors[0], [8.0, 8.0, 34.0, 30.0])
    # seed index is fastest-varying
    np.testing.assert_allclose(anchors[1], [8.0, 8.0, 75.0, 45.0])
    # then w: anchor 9 is cell (0, 1) -> centre x = 24
    np.testing.assert_allclose(anchors[9], [24.0, 8.0, 34.0, 30.0])
    # then h: anchor 78*9 is cell (1, 0) -> centre y = 24
    np.testing.assert_allclose(anchors[78 * 9], [8.0, 24.0, 34.0, 30.0])


def test_matches_reference_formula():
    got = generate_anchors((24, 78), (384, 1248), KITTI_SEEDS)
    want = _reference_formula((24, 78), (384, 1248), KITTI_SEEDS)
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-6)


def test_uneven_grid():
    got = generate_anchors((3, 5), (96, 160), KITTI_SEEDS[:2])
    want = _reference_formula((3, 5), (96, 160), KITTI_SEEDS[:2])
    assert got.shape == (30, 4)
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-6)
