"""Torch-based numerical oracles for parity tests.

A minimal functional re-statement of the SqueezeDet forward/decode/loss in
torch (CPU), driven by the same ARCH_SPECS data and the same params pytree as
the JAX model. Used only in tests to cross-check numerics (conv padding,
ceil-mode pooling, softmax/sigmoid/decode, loss terms) against an independent
framework.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

from squeezedet_tpu.models.squeezedet import ARCH_SPECS, ModelSpec


def _t(x) -> torch.Tensor:
    return torch.from_numpy(np.array(x, dtype=np.float32))


def _conv_nchw(x, p, stride=1, pad=0):
    # params are HWIO; torch wants OIHW
    w = _t(p["w"]).permute(3, 2, 0, 1)
    b = _t(p["b"])
    return F.conv2d(x, w, b, stride=stride, padding=pad)


def forward_torch(params, images_nhwc: np.ndarray, spec: ModelSpec) -> np.ndarray:
    """Full backbone+head forward, no dropout. Returns (B, A, C+5) numpy."""
    arch = ARCH_SPECS[spec.arch]
    stem = arch["stem"]
    x = _t(images_nhwc).permute(0, 3, 1, 2)

    x = F.relu(_conv_nchw(x, params["stem"], stride=stem["stride"], pad=stem["pad"]))
    fire_i = 0
    for item in arch["body"]:
        if item == "pool":
            x = F.max_pool2d(x, kernel_size=3, stride=2, ceil_mode=True)
        else:
            p = params[f"fire{fire_i}"]
            s = F.relu(_conv_nchw(x, p["squeeze"]))
            x = torch.cat(
                [F.relu(_conv_nchw(s, p["expand1"])), F.relu(_conv_nchw(s, p["expand3"], pad=1))],
                dim=1,
            )
            fire_i += 1

    x = _conv_nchw(x, params["convdet"], pad=1)
    x = x.permute(0, 2, 3, 1).contiguous()
    b = x.shape[0]
    return x.view(b, -1, spec.num_classes + 5).detach().numpy()


def forward_classifier_torch(params, images_nhwc, cls_spec) -> np.ndarray:
    """Classifier forward twin (no dropout): trunk prefix -> 1x1 conv ->
    global average pool. Returns (B, num_classes) numpy."""
    from squeezedet_tpu.models.classifier import trunk_body

    arch = ARCH_SPECS[cls_spec.arch]
    stem = arch["stem"]
    x = _t(images_nhwc).permute(0, 3, 1, 2)
    x = F.relu(_conv_nchw(x, params["stem"], stride=stem["stride"], pad=stem["pad"]))
    fire_i = 0
    for item in trunk_body(cls_spec):
        if item == "pool":
            x = F.max_pool2d(x, kernel_size=3, stride=2, ceil_mode=True)
        else:
            p = params[f"fire{fire_i}"]
            s = F.relu(_conv_nchw(x, p["squeeze"]))
            x = torch.cat(
                [F.relu(_conv_nchw(s, p["expand1"])), F.relu(_conv_nchw(s, p["expand3"], pad=1))],
                dim=1,
            )
            fire_i += 1
    x = _conv_nchw(x, params["classifier"])
    return x.mean(dim=(2, 3)).detach().numpy()


def resolve_torch(pred: np.ndarray, anchors: np.ndarray, input_size, num_classes):
    """Decode raw head output: softmax probs, sigmoid scores, delta boxes."""
    pred = _t(pred)
    anchors_t = _t(anchors)

    logits = pred[..., :num_classes]
    probs = torch.softmax(logits, dim=-1)
    log_probs = torch.log_softmax(logits, dim=-1)
    scores = torch.sigmoid(pred[..., num_classes : num_classes + 1])
    deltas = pred[..., num_classes + 1 :]

    ax, ay, aw, ah = anchors_t[:, 0], anchors_t[:, 1], anchors_t[:, 2], anchors_t[:, 3]
    cx = ax + aw * deltas[..., 0]
    cy = ay + ah * deltas[..., 1]
    w = aw * torch.exp(deltas[..., 2])
    h = ah * torch.exp(deltas[..., 3])
    x1 = cx - 0.5 * (w - 1)
    y1 = cy - 0.5 * (h - 1)
    x2 = cx + 0.5 * (w - 1)
    y2 = cy + 0.5 * (h - 1)
    boxes = torch.stack([x1, y1, x2, y2], dim=-1)
    ih, iw = input_size
    boxes[..., [0, 2]] = boxes[..., [0, 2]].clamp(0, iw - 1)
    boxes[..., [1, 3]] = boxes[..., [1, 3]].clamp(0, ih - 1)

    return (
        probs.numpy(),
        log_probs.numpy(),
        scores.numpy(),
        deltas.numpy(),
        boxes.numpy(),
    )


def loss_torch(pred, gt, anchors, input_size, num_classes, weights):
    """Four-part loss with the reference normalizations (no epsilon guard —
    callers must supply >=1 object per image)."""
    probs, log_probs, scores, deltas, boxes = resolve_torch(
        pred, anchors, input_size, num_classes
    )
    gt = _t(gt)
    log_probs, scores = _t(log_probs), _t(scores)
    deltas, boxes = _t(deltas), _t(boxes)

    masks = gt[..., :1]
    gt_boxes = gt[..., 1:5]
    gt_deltas = gt[..., 5:9]
    gt_onehot = gt[..., 9:]
    num_objects = masks.sum(dim=[1, 2])
    num_anchors = gt.shape[1]

    eps = 1e-10
    lr = (
        torch.min(gt_boxes[..., 2:3], boxes[..., 2:3])
        - torch.max(gt_boxes[..., 0:1], boxes[..., 0:1])
    ).clamp(min=0)
    tb = (
        torch.min(gt_boxes[..., 3:4], boxes[..., 3:4])
        - torch.max(gt_boxes[..., 1:2], boxes[..., 1:2])
    ).clamp(min=0)
    inter = lr * tb
    union = (
        (gt_boxes[..., 2:3] - gt_boxes[..., 0:1]) * (gt_boxes[..., 3:4] - gt_boxes[..., 1:2])
        + (boxes[..., 2:3] - boxes[..., 0:1]) * (boxes[..., 3:4] - boxes[..., 1:2])
        - inter
    )
    overlaps = inter / (union + eps) * masks

    cw, pw, nw, bw = weights
    class_loss = (cw * masks * gt_onehot * (-log_probs)).sum(dim=[1, 2]) / num_objects
    pos = (pw * masks * (overlaps - scores) ** 2).sum(dim=[1, 2]) / num_objects
    neg = (nw * (1 - masks) * (overlaps - scores) ** 2).sum(dim=[1, 2]) / (
        num_anchors - num_objects
    )
    bbox = (bw * masks * (deltas - gt_deltas) ** 2).sum(dim=[1, 2]) / num_objects
    total = class_loss + pos + neg + bbox
    return {
        "loss": total.numpy(),
        "class_loss": class_loss.numpy(),
        "score_loss": (pos + neg).numpy(),
        "bbox_loss": bbox.numpy(),
    }


def greedy_nms_reference(boxes, scores, iou_thresh):
    """Plain-python greedy NMS (torchvision semantics: suppress IoU >
    threshold). boxes (K,4) xyxy, scores (K,). Returns kept indices."""
    order = np.argsort(-scores, kind="stable")
    kept = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    for i in order:
        if suppressed[i]:
            continue
        kept.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / np.maximum(area_i + areas - inter, 1e-10)
        suppressed |= iou > iou_thresh
        suppressed[i] = False  # keep self
    return sorted(kept)


def train_oracle(params_np, images, gt, anchors, input_size, num_classes,
                 weights, steps=3, lr=0.01, momentum=0.9, weight_decay=1e-4,
                 grad_norm=5.0):
    """Differentiable torch training replica: forward + 4-part loss + SGD
    (clip -> weight decay -> momentum) for `steps` steps, no dropout.
    Returns the updated params as numpy (same pytree layout as ours)."""
    from squeezedet_tpu.models.squeezedet import ARCH_SPECS, ModelSpec

    spec = ModelSpec(num_classes=num_classes, dropout_prob=0.0)

    # build torch parameters (keep HWIO layout; permute at use)
    tparams = {}

    def to_param(leaf):
        return torch.nn.Parameter(torch.from_numpy(np.array(leaf, np.float32)))

    for k, v in params_np.items():
        if "fire" in k:
            tparams[k] = {
                sub: {"w": to_param(v[sub]["w"]), "b": to_param(v[sub]["b"])}
                for sub in v
            }
        else:
            tparams[k] = {"w": to_param(v["w"]), "b": to_param(v["b"])}

    flat = []
    for k, v in tparams.items():
        if "fire" in k:
            for sub in v.values():
                flat += [sub["w"], sub["b"]]
        else:
            flat += [v["w"], v["b"]]

    opt = torch.optim.SGD(flat, lr=lr, momentum=momentum,
                          weight_decay=weight_decay)

    def conv(x, p, stride=1, pad=0):
        return F.conv2d(x, p["w"].permute(3, 2, 0, 1), p["b"],
                        stride=stride, padding=pad)

    arch = ARCH_SPECS[spec.arch]
    stem = arch["stem"]
    x_in = torch.from_numpy(np.array(images, np.float32)).permute(0, 3, 1, 2)
    gt_t = torch.from_numpy(np.array(gt, np.float32))
    anchors_t = torch.from_numpy(np.array(anchors, np.float32))

    def forward():
        x = F.relu(conv(x_in, tparams["stem"], stride=stem["stride"],
                        pad=stem["pad"]))
        fire_i = 0
        for item in arch["body"]:
            if item == "pool":
                x = F.max_pool2d(x, 3, stride=2, ceil_mode=True)
            else:
                p = tparams[f"fire{fire_i}"]
                s = F.relu(conv(x, p["squeeze"]))
                x = torch.cat([F.relu(conv(s, p["expand1"])),
                               F.relu(conv(s, p["expand3"], pad=1))], dim=1)
                fire_i += 1
        x = conv(x, tparams["convdet"], pad=1)
        x = x.permute(0, 2, 3, 1).contiguous()
        return x.view(x.shape[0], -1, num_classes + 5)

    def loss_fn(pred):
        logits = pred[..., :num_classes]
        log_probs = torch.log_softmax(logits, dim=-1)
        scores = torch.sigmoid(pred[..., num_classes:num_classes + 1])
        deltas = pred[..., num_classes + 1:]
        ax, ay, aw, ah = anchors_t.T
        cx = ax + aw * deltas[..., 0]
        cy = ay + ah * deltas[..., 1]
        w = aw * torch.exp(deltas[..., 2])
        h = ah * torch.exp(deltas[..., 3])
        boxes = torch.stack([cx - 0.5 * (w - 1), cy - 0.5 * (h - 1),
                             cx + 0.5 * (w - 1), cy + 0.5 * (h - 1)], dim=-1)
        ih, iw = input_size
        boxes = torch.stack([boxes[..., 0].clamp(0, iw - 1),
                             boxes[..., 1].clamp(0, ih - 1),
                             boxes[..., 2].clamp(0, iw - 1),
                             boxes[..., 3].clamp(0, ih - 1)], dim=-1)

        masks = gt_t[..., :1]
        gt_boxes = gt_t[..., 1:5]
        gt_deltas = gt_t[..., 5:9]
        gt_onehot = gt_t[..., 9:]
        num_objects = masks.sum(dim=[1, 2])
        eps = 1e-10

        lr_ = (torch.min(gt_boxes[..., 2:3], boxes[..., 2:3])
               - torch.max(gt_boxes[..., 0:1], boxes[..., 0:1])).clamp(min=0)
        tb = (torch.min(gt_boxes[..., 3:4], boxes[..., 3:4])
              - torch.max(gt_boxes[..., 1:2], boxes[..., 1:2])).clamp(min=0)
        inter = lr_ * tb
        union = ((gt_boxes[..., 2:3] - gt_boxes[..., 0:1])
                 * (gt_boxes[..., 3:4] - gt_boxes[..., 1:2])
                 + (boxes[..., 2:3] - boxes[..., 0:1])
                 * (boxes[..., 3:4] - boxes[..., 1:2]) - inter)
        overlaps = inter / (union + eps) * masks

        cw, pw, nw, bw = weights
        num_anchors = gt_t.shape[1]
        cls = (cw * masks * gt_onehot * (-log_probs)).sum(dim=[1, 2]) / (num_objects + eps)
        pos = (pw * masks * (overlaps - scores) ** 2).sum(dim=[1, 2]) / (num_objects + eps)
        neg = (nw * (1 - masks) * (overlaps - scores) ** 2).sum(dim=[1, 2]) / (
            num_anchors - num_objects + eps)
        bbox = (bw * masks * (deltas - gt_deltas) ** 2).sum(dim=[1, 2]) / (num_objects + eps)
        return (cls + pos + neg + bbox).mean()

    losses = []
    for _ in range(steps):
        opt.zero_grad()
        loss = loss_fn(forward())
        losses.append(float(loss.detach()))
        loss.backward()
        torch.nn.utils.clip_grad_norm_(flat, grad_norm)
        opt.step()

    def detach(node):
        if isinstance(node, dict):
            return {k: detach(v) for k, v in node.items()}
        return node.detach().numpy()

    return {k: detach(v) for k, v in tparams.items()}, losses
