"""Training losses for the four networks.

Reference loss landscape (SURVEY.md §2, unverified — mount was empty):
  * Mask R-CNN: RPN binary xent + smooth-L1, box head softmax xent +
    smooth-L1, mask head per-pixel sigmoid xent (TF Mask R-CNN `model.py`),
  * refinement net: per-pixel 2-class xent (OnAVOS-family `Measures.py`),
  * ReID net: batch-hard triplet loss (Hermans et al., "In Defense of the
    Triplet Loss"),
  * FlowNet2: multi-scale endpoint error (flownet2 `losses.py`).

All functions are mask-aware (padded batches) and jit/vmap/grad-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_xent(logits, labels, mask=None):
    """Mean binary cross-entropy from logits; optional element mask."""
    ls = jax.nn.log_sigmoid(logits)
    lns = jax.nn.log_sigmoid(-logits)
    loss = -(labels * ls + (1.0 - labels) * lns)
    if mask is not None:
        loss = loss * mask
        return loss.sum() / jnp.maximum(mask.sum(), 1.0)
    return loss.mean()


def softmax_xent(logits, labels, mask=None):
    """Mean categorical cross-entropy; integer labels; optional row mask."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if mask is not None:
        nll = nll * mask
        return nll.sum() / jnp.maximum(mask.sum(), 1.0)
    return nll.mean()


def smooth_l1(pred, target, beta: float = 1.0 / 9.0, mask=None):
    """Huber / smooth-L1 over the last axis, averaged over valid rows."""
    d = jnp.abs(pred - target)
    loss = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta).sum(-1)
    if mask is not None:
        loss = loss * mask
        return loss.sum() / jnp.maximum(mask.sum(), 1.0)
    return loss.mean()


def batch_hard_triplet(emb, ids, margin: float = 0.2, mask=None):
    """Batch-hard triplet loss (hardest positive / hardest negative per
    anchor, soft-margin optional via margin<0 → softplus).

    emb: [B, E]; ids: [B] int identity labels; mask: [B] valid rows.
    """
    from premvos_tpu.stages.reid import pairwise_sq_distances

    d = jnp.sqrt(pairwise_sq_distances(emb, emb) + 1e-12)
    same = ids[:, None] == ids[None, :]
    eye = jnp.eye(emb.shape[0], dtype=bool)
    if mask is not None:
        valid_pair = jnp.logical_and(mask[:, None], mask[None, :])
    else:
        valid_pair = jnp.ones_like(same)

    pos = jnp.logical_and(jnp.logical_and(same, ~eye), valid_pair)
    neg = jnp.logical_and(~same, valid_pair)

    hardest_pos = jnp.max(jnp.where(pos, d, 0.0), axis=1)
    hardest_neg = jnp.min(jnp.where(neg, d, jnp.inf), axis=1)
    has_both = jnp.logical_and(jnp.any(pos, axis=1), jnp.any(neg, axis=1))

    if margin >= 0:
        per = jnp.maximum(hardest_pos - hardest_neg + margin, 0.0)
    else:  # soft margin
        per = jax.nn.softplus(hardest_pos - hardest_neg)
    per = jnp.where(has_both, per, 0.0)
    denom = jnp.maximum(has_both.sum(), 1)
    return per.sum() / denom


def endpoint_error(pred, target, mask=None):
    """Mean flow endpoint error ‖pred − target‖₂ over pixels."""
    epe = jnp.sqrt(jnp.sum((pred - target) ** 2, axis=-1) + 1e-12)
    if mask is not None:
        epe = epe * mask
        return epe.sum() / jnp.maximum(mask.sum(), 1.0)
    return epe.mean()


def multiscale_epe(pred_flows, target, weights=None):
    """FlowNet multi-scale EPE: list of [B, h_i, w_i, 2] coarse→fine preds
    against a full-res target (downsampled per scale, flownet convention)."""
    weights = weights or (0.32, 0.08, 0.02, 0.01, 0.005)[: len(pred_flows)][::-1]
    total = 0.0
    for wgt, p in zip(weights, pred_flows):
        t = jax.image.resize(target, (*target.shape[:-3], *p.shape[-3:-1], 2),
                             "bilinear")
        scale = p.shape[-2] / target.shape[-2]
        total = total + wgt * endpoint_error(p, t * scale)
    return total


def sigmoid_focal(logits, labels, alpha: float = 0.25, gamma: float = 2.0,
                  mask=None, norm=None):
    """Sigmoid focal loss (RetinaNet) from logits.

    labels ∈ {0, 1} float; mask zeroes ignored elements; `norm` overrides
    the normalizer (RetinaNet convention: number of positives, min 1).
    """
    p = jax.nn.sigmoid(logits)
    ls = jax.nn.log_sigmoid(logits)
    lns = jax.nn.log_sigmoid(-logits)
    ce = -(labels * ls + (1.0 - labels) * lns)
    p_t = labels * p + (1.0 - labels) * (1.0 - p)
    a_t = labels * alpha + (1.0 - labels) * (1.0 - alpha)
    loss = a_t * jnp.power(1.0 - p_t, gamma) * ce
    if mask is not None:
        loss = loss * mask
    if norm is None:
        norm = mask.sum() if mask is not None else loss.size
    return loss.sum() / jnp.maximum(norm, 1.0)
