"""Box utilities (xyxy convention, float coordinates).

Covers the box arithmetic the reference spreads across its Mask R-CNN
`model.py` (box transform encode/decode, IoU for NMS and target assignment)
and the merge stage's objectness/overlap scoring. All functions are
shape-polymorphic pure jnp, safe under jit/vmap, and operate on padded arrays
(callers carry validity masks).
"""

from __future__ import annotations

import jax.numpy as jnp

# Faster R-CNN box-delta clamp: prevents exp overflow for large predicted dw/dh
# (log(1000/16) ≈ 4.135, the standard detectron value).
BBOX_XFORM_CLIP = 4.135166556742356


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of [..., 4] xyxy boxes."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU matrix between [N, 4] and [M, 4] xyxy boxes → [N, M]."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def clip_boxes(boxes: jnp.ndarray, height, width) -> jnp.ndarray:
    """Clip xyxy boxes to [0, width] x [0, height]."""
    x1 = jnp.clip(boxes[..., 0], 0.0, width)
    y1 = jnp.clip(boxes[..., 1], 0.0, height)
    x2 = jnp.clip(boxes[..., 2], 0.0, width)
    y2 = jnp.clip(boxes[..., 3], 0.0, height)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def encode_boxes(boxes: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Encode target boxes relative to anchors as (dx, dy, dw, dh) deltas."""
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = anchors[..., 0] + 0.5 * aw
    ay = anchors[..., 1] + 0.5 * ah

    bw = boxes[..., 2] - boxes[..., 0]
    bh = boxes[..., 3] - boxes[..., 1]
    bx = boxes[..., 0] + 0.5 * bw
    by = boxes[..., 1] + 0.5 * bh

    eps = 1e-12
    dx = (bx - ax) / jnp.maximum(aw, eps)
    dy = (by - ay) / jnp.maximum(ah, eps)
    dw = jnp.log(jnp.maximum(bw, eps) / jnp.maximum(aw, eps))
    dh = jnp.log(jnp.maximum(bh, eps) / jnp.maximum(ah, eps))
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode_boxes(deltas: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Apply (dx, dy, dw, dh) deltas to anchors → xyxy boxes."""
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = anchors[..., 0] + 0.5 * aw
    ay = anchors[..., 1] + 0.5 * ah

    dx, dy = deltas[..., 0], deltas[..., 1]
    dw = jnp.clip(deltas[..., 2], a_max=BBOX_XFORM_CLIP)
    dh = jnp.clip(deltas[..., 3], a_max=BBOX_XFORM_CLIP)

    cx = dx * aw + ax
    cy = dy * ah + ay
    w = jnp.exp(dw) * aw
    h = jnp.exp(dh) * ah
    return jnp.stack(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )
