"""Region Proposal Network head + padded proposal generation.

Reference: `rpn_head` and `generate_rpn_proposals` in the TF Mask R-CNN's
`model.py` (unverified — mount was empty; SURVEY.md §3.1). The reference's
proposal generation has dynamic shapes everywhere (top-k then dynamic NMS);
here every step is static: per-level top-k with `lax.top_k`, padded NMS over
the concatenated levels, fixed post-NMS count with a validity mask.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from premvos_tpu.ops.boxes import clip_boxes, decode_boxes
from premvos_tpu.ops.nms import NEG_INF, nms


class RPNHead(nn.Module):
    """Shared 3×3 conv + 1×1 objectness/deltas, applied per level."""

    num_anchors: int = 3
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray):
        x = nn.relu(
            nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype)(feat)
        )
        logits = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype)(x)
        deltas = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype)(x)
        b, h, w, _ = feat.shape
        return (
            logits.reshape(b, h * w * self.num_anchors),
            deltas.reshape(b, h * w * self.num_anchors, 4),
        )


def generate_proposals(
    level_logits: dict,
    level_deltas: dict,
    level_anchors: dict,
    image_hw: tuple,
    pre_nms_topk: int = 1024,
    post_nms_topk: int = 256,
    nms_threshold: float = 0.7,
    min_size: float = 0.0,
):
    """Per-level top-k → decode → clip → joint padded NMS.

    All inputs are single-image ([Ni] / [Ni, 4] per level); batch via vmap.
    Returns (boxes [K, 4], scores [K], valid [K]) with K = post_nms_topk.
    """
    h, w = image_hw
    all_boxes, all_scores = [], []
    for lvl, logits in level_logits.items():
        deltas = level_deltas[lvl]
        anchors = level_anchors[lvl]
        k = min(pre_nms_topk, logits.shape[0])
        top_scores, idx = jax.lax.top_k(logits, k)
        boxes = decode_boxes(deltas[idx], anchors[idx])
        boxes = clip_boxes(boxes, float(h), float(w))
        if min_size > 0:
            ok = jnp.logical_and(
                boxes[:, 2] - boxes[:, 0] >= min_size,
                boxes[:, 3] - boxes[:, 1] >= min_size,
            )
            top_scores = jnp.where(ok, top_scores, NEG_INF)
        all_boxes.append(boxes)
        all_scores.append(top_scores)

    boxes = jnp.concatenate(all_boxes, axis=0)
    scores = jnp.concatenate(all_scores, axis=0)
    idx, keep = nms(
        boxes,
        jax.nn.sigmoid(scores.astype(jnp.float32)),
        max_outputs=post_nms_topk,
        iou_threshold=nms_threshold,
        score_threshold=0.0,
        valid=scores > NEG_INF / 2,
    )
    safe = jnp.maximum(idx, 0)
    out_boxes = jnp.where(keep[:, None], boxes[safe], 0.0)
    out_scores = jnp.where(
        keep, jax.nn.sigmoid(scores[safe].astype(jnp.float32)), 0.0
    )
    return out_boxes, out_scores, keep
