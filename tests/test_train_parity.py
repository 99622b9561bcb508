"""End-to-end training parity: several full train steps (fwd + loss + bwd +
clip + SGD/momentum/wd update) must track an independent torch replica."""

import jax
import jax.numpy as jnp
import numpy as np

from squeezedet_tpu.core.anchors import generate_anchors
from squeezedet_tpu.core.boxes import xywh_to_xyxy
from squeezedet_tpu.core.matching import encode_annotations
from squeezedet_tpu.models.loss import LossWeights
from squeezedet_tpu.models.squeezedet import ModelSpec, init_params
from squeezedet_tpu.parallel.train import (
    TaskSpec,
    init_train_state,
    make_train_step,
)

from tests.torch_oracle import train_oracle

SEEDS = np.array(
    [[34, 30], [75, 45], [38, 90], [127, 68], [80, 174], [196, 97],
     [194, 178], [283, 156], [381, 185]], dtype=np.float32,
)
INPUT_SIZE = (96, 160)
ANCHORS = generate_anchors((6, 10), INPUT_SIZE, SEEDS / 4.0)


def test_three_train_steps_match_torch():
    model = ModelSpec(num_classes=3, anchors_per_grid=9, dropout_prob=0.0)
    task = TaskSpec(
        model=model, input_size=INPUT_SIZE, num_anchors=ANCHORS.shape[0]
    )
    params = init_params(jax.random.PRNGKey(0), model)
    params_np = jax.tree.map(np.asarray, params)

    rng = np.random.default_rng(1)
    images = rng.normal(size=(2, *INPUT_SIZE, 3)).astype(np.float32)
    gts = []
    for _ in range(2):
        idx = rng.choice(ANCHORS.shape[0], 3, replace=False)
        boxes = xywh_to_xyxy(ANCHORS[idx])
        gts.append(encode_annotations(rng.integers(0, 3, 3), boxes, ANCHORS, 3))
    gt = np.stack(gts)

    # ours: 3 jitted steps
    step = make_train_step(task)
    state = init_train_state(params, task)
    key = jax.random.PRNGKey(2)  # unused (no dropout)
    our_losses = []
    for _ in range(3):
        state, stats = step(
            state, jnp.asarray(images), jnp.asarray(gt), jnp.asarray(ANCHORS),
            0.01, key,
        )
        our_losses.append(float(stats["loss"]))

    # torch replica
    torch_params, torch_losses = train_oracle(
        params_np, images, gt, ANCHORS, INPUT_SIZE, 3,
        tuple(LossWeights()), steps=3,
    )

    np.testing.assert_allclose(our_losses, torch_losses, rtol=1e-4, atol=1e-5)

    ours_flat = jax.tree.map(np.asarray, state.params)

    def compare(a, b, path=""):
        if isinstance(a, dict):
            for k in a:
                compare(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_allclose(
                a, b, rtol=5e-3, atol=2e-5, err_msg=path
            )

    compare(ours_flat, torch_params)
