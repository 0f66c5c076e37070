"""Train-time metrics (SURVEY.md C2/C4 `Measures.py` equivalent).

The OnAVOS-family engines report per-step measures (pixel accuracy, IoU)
alongside the loss; these are the jit-safe equivalents, mask-aware for padded
batches. Final benchmark metrics live in eval/davis_eval.py.
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_accuracy(logits, labels, mask=None):
    """Binary segmentation accuracy from logits; labels ∈ {0, 1}."""
    pred = (logits > 0).astype(jnp.float32)
    correct = (pred == labels).astype(jnp.float32)
    if mask is not None:
        correct = correct * mask
        return correct.sum() / jnp.maximum(mask.sum(), 1.0)
    return correct.mean()


def binary_iou(logits, labels, mask=None, eps: float = 1.0):
    """Mean foreground IoU over the batch from logits; labels ∈ {0, 1}.

    logits/labels: [B, ...]; mask: optional same-shape element validity.
    """
    pred = (logits > 0).astype(jnp.float32)
    lab = (labels > 0.5).astype(jnp.float32)
    if mask is not None:
        pred = pred * mask
        lab = lab * mask
    axes = tuple(range(1, pred.ndim))
    inter = (pred * lab).sum(axes)
    union = pred.sum(axes) + lab.sum(axes) - inter
    return ((inter + eps) / (union + eps)).mean()


def embedding_retrieval_accuracy(emb, ids, mask=None):
    """Top-1 same-identity retrieval accuracy (ReID training measure):
    fraction of anchors whose nearest other embedding shares their id."""
    from premvos_tpu.stages.reid import pairwise_sq_distances

    d = pairwise_sq_distances(emb, emb)
    n = emb.shape[0]
    eye = jnp.eye(n, dtype=bool)
    big = jnp.float32(1e9)
    d = jnp.where(eye, big, d)
    if mask is not None:
        pair_ok = jnp.logical_and(mask[:, None], mask[None, :])
        d = jnp.where(pair_ok, d, big)
    nearest = jnp.argmin(d, axis=1)
    correct = (ids[nearest] == ids).astype(jnp.float32)
    if mask is not None:
        correct = correct * mask
        return correct.sum() / jnp.maximum(mask.sum(), 1.0)
    return correct.mean()
