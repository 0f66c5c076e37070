"""Mask R-CNN training: target assignment and losses (SURVEY.md C1 train path).

Reference: anchor/proposal target logic in the TF Mask R-CNN's `data.py` /
`model.py` (unverified — mount was empty). Standard recipe, fully static
shapes:

  * RPN: anchors labeled positive at IoU ≥ pos_iou (plus best-anchor-per-GT),
    negative below neg_iou, rest ignored; balanced sampling implemented as
    top-k over randomized priorities (no dynamic boolean indexing);
  * RoI heads: proposals labeled foreground at IoU ≥ fg_iou; box targets are
    encoded deltas to the matched GT; mask targets are the matched GT mask
    cropped to the proposal box at mask resolution (MXU crop op);
  * losses: binary/softmax xent + smooth-L1 + per-pixel sigmoid xent, each
    averaged over its valid sample set.

Everything is jit/vmap/grad-safe; batch via vmap over images.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from premvos_tpu.ops.boxes import box_iou, encode_boxes
from premvos_tpu.ops.roi_align import crop_and_resize
from premvos_tpu.train.losses import (
    sigmoid_focal, sigmoid_xent, smooth_l1, softmax_xent,
)


def assign_rpn_targets(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    rng: jax.Array,
    pos_iou: float = 0.7,
    neg_iou: float = 0.3,
    num_samples: int = 256,
    pos_fraction: float = 0.5,
):
    """Label anchors and pick a balanced training sample.

    Returns (labels [A] ∈ {1 pos, 0 neg, −1 ignore after sampling},
             box_targets [A, 4]).
    """
    a = anchors.shape[0]
    iou = box_iou(anchors, gt_boxes)  # [A, G]
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)

    pos = best_iou >= pos_iou
    # Best anchor per GT is positive regardless of threshold.
    best_anchor_per_gt = jnp.argmax(iou, axis=0)  # [G]
    force = jnp.zeros((a,), bool).at[best_anchor_per_gt].set(gt_valid)
    pos = jnp.logical_or(pos, force)
    neg = jnp.logical_and(best_iou < neg_iou, ~pos)

    # Balanced sampling via randomized priorities + top-k.
    k_pos = int(num_samples * pos_fraction)
    k_neg = num_samples - k_pos
    r1, r2 = jax.random.split(rng)
    pri_pos = jnp.where(pos, jax.random.uniform(r1, (a,)), -1.0)
    pri_neg = jnp.where(neg, jax.random.uniform(r2, (a,)), -1.0)
    _, pos_idx = jax.lax.top_k(pri_pos, k_pos)
    _, neg_idx = jax.lax.top_k(pri_neg, k_neg)

    labels = jnp.full((a,), -1, jnp.int32)
    labels = labels.at[pos_idx].set(jnp.where(pos[pos_idx], 1, -1))
    labels = labels.at[neg_idx].set(jnp.where(neg[neg_idx], 0, -1))

    targets = encode_boxes(gt_boxes[best_gt], anchors)
    return labels, targets


def rpn_loss(logits, deltas, labels, box_targets):
    """logits [A], deltas [A, 4] vs assign_rpn_targets output."""
    valid = labels >= 0
    cls = sigmoid_xent(
        logits, (labels == 1).astype(logits.dtype), mask=valid.astype(logits.dtype)
    )
    pos = (labels == 1).astype(logits.dtype)
    box = smooth_l1(deltas, box_targets, mask=pos)
    return cls, box


def assign_rpn_labels_dense(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    pos_iou: float = 0.7,
    neg_iou: float = 0.3,
):
    """IoU-threshold labels for EVERY anchor — no sampling.

    Returns (labels [A] ∈ {1 pos, 0 neg, −1 ignore in the IoU dead band},
             box_targets [A, 4]). Pairs with `rpn_dense_loss` (sigmoid
    focal): all anchors of all FPN levels receive gradient every step, so
    no level can drift to confident-garbage objectness for lack of sampled
    negatives (ProposalConfig.rpn_loss rationale)."""
    iou = box_iou(anchors, gt_boxes)  # [A, G]
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    pos = best_iou >= pos_iou
    best_anchor_per_gt = jnp.argmax(iou, axis=0)  # [G]
    force = jnp.zeros((anchors.shape[0],), bool).at[best_anchor_per_gt].set(
        gt_valid
    )
    pos = jnp.logical_or(pos, force)
    neg = jnp.logical_and(best_iou < neg_iou, ~pos)
    labels = jnp.where(pos, 1, jnp.where(neg, 0, -1)).astype(jnp.int32)
    return labels, encode_boxes(gt_boxes[best_gt], anchors)


def rpn_dense_loss(logits, deltas, labels, box_targets,
                   alpha: float = 0.25, gamma: float = 2.0):
    """Focal objectness over all labeled anchors (normalized by #pos) +
    smooth-L1 box loss on positives."""
    valid = (labels >= 0).astype(logits.dtype)
    pos = (labels == 1).astype(logits.dtype)
    n_pos = pos.sum()
    cls = sigmoid_focal(
        logits, pos, alpha=alpha, gamma=gamma, mask=valid, norm=n_pos
    )
    box = smooth_l1(deltas, box_targets, mask=pos)
    return cls, box


def assign_roi_targets(
    proposals: jnp.ndarray,
    prop_valid: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    fg_iou: float = 0.5,
):
    """Label proposals for the second stage.

    Returns (cls_labels [K] ∈ {0 bg, 1 fg}, matched_gt [K] int,
             box_targets [K, 4], fg [K] bool, valid [K] bool).
    """
    iou = box_iou(proposals, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    fg = jnp.logical_and(best_iou >= fg_iou, prop_valid)
    box_targets = encode_boxes(gt_boxes[best_gt], proposals)
    return fg.astype(jnp.int32), best_gt, box_targets, fg, prop_valid


def mask_targets(
    gt_masks: jnp.ndarray,
    matched_gt: jnp.ndarray,
    proposals: jnp.ndarray,
    resolution: int,
    image_hw: tuple,
):
    """Crop each proposal's matched GT mask to [K, R, R] targets."""
    h, w = image_hw
    sel = gt_masks[matched_gt]  # [K, H, W]
    norm = jnp.stack(
        [
            proposals[:, 1] / (h - 1),
            proposals[:, 0] / (w - 1),
            proposals[:, 3] / (h - 1),
            proposals[:, 2] / (w - 1),
        ],
        axis=-1,
    )

    def crop_one(m, b):
        return crop_and_resize(m[..., None], b[None], resolution)[0, ..., 0]

    return jax.vmap(crop_one)(sel, norm)


def detection_loss(
    cls_logits,
    box_deltas,
    mask_logits,
    cls_labels,
    box_targets,
    mask_tgts,
    fg,
    valid,
):
    """Second-stage loss triple (cls, box, mask)."""
    vmask = valid.astype(cls_logits.dtype)
    fmask = jnp.logical_and(fg, valid).astype(cls_logits.dtype)
    cls = softmax_xent(cls_logits, cls_labels, mask=vmask)
    box = smooth_l1(box_deltas, box_targets, mask=fmask)
    # Per-pixel mask loss only on foreground rois.
    pix_mask = fmask[:, None, None] * jnp.ones_like(mask_logits)
    mask = sigmoid_xent(mask_logits, (mask_tgts > 0.5).astype(mask_logits.dtype),
                        mask=pix_mask)
    return cls, box, mask


def maskrcnn_loss_fn(model, anchors, cfg, image_hw, rng=None):
    """Build a loss(params, batch) closure for the generic DP trainer.

    batch = (images [B,H,W,3] normalized, gt_boxes [B,G,4], gt_masks
    [B,G,H,W], gt_valid [B,G][, keys [B] uint32 per-image sampling seeds]).
    If keys are absent, `rng` seeds anchor sampling (fixed across steps).
    """
    flat_anchors = jnp.concatenate(
        [anchors[k] for k in sorted(anchors)], axis=0
    )

    def loss_fn(params, batch):
        if len(batch) == 5:
            images, gt_boxes, gt_masks, gt_valid, seeds = batch
        else:
            images, gt_boxes, gt_masks, gt_valid = batch
            seeds = None
        b = images.shape[0]

        def fwd(imgs):
            feats = model.apply(params, imgs, method=model.features)
            logits, deltas = model.apply(
                params, feats, method=model.rpn_outputs
            )
            rois, _, roi_valid = model.apply(
                params, feats, anchors, image_hw, method=model.proposals
            )
            # Detach proposal coordinates (standard Mask R-CNN recipe — the
            # RPN trains only through its own loss; reference: tensorpack
            # model_box decode under stop_gradient, SURVEY C1 *unverified*).
            # Also the decisive memory fix for the fused fine-tune: with
            # rois differentiable, the VJP of every RoIAlign interpolation
            # einsum must SAVE its [N, p·s, W, C] intermediate as a residual
            # to form d(align)/d(box-weights) — ~12 GB across the mask+box
            # heads at batch 4, the round-4 480p RESOURCE_EXHAUSTED (docs/
            # MEMORY_BUDGET.md). With boxes constant, grad w.r.t. features
            # needs only the small interpolation-weight matrices.
            rois = jax.lax.stop_gradient(rois)
            return feats, logits, deltas, rois, roi_valid

        feats, logits, deltas, rois, roi_valid = fwd(images)
        flat_logits = jnp.concatenate(
            [logits[k] for k in sorted(logits)], axis=1
        )
        flat_deltas = jnp.concatenate(
            [deltas[k] for k in sorted(deltas)], axis=1
        )

        def per_image(args):
            (fl, fd, f, roi, rv, gb, gm, gv, key) = args
            if getattr(cfg, "rpn_loss", "dense") == "dense":
                labels, tgts = assign_rpn_labels_dense(flat_anchors, gb, gv)
                l_rpn_cls, l_rpn_box = rpn_dense_loss(
                    fl, fd, labels, tgts,
                    alpha=cfg.focal_alpha, gamma=cfg.focal_gamma,
                )
            else:
                labels, tgts = assign_rpn_targets(flat_anchors, gb, gv, key)
                l_rpn_cls, l_rpn_box = rpn_loss(fl, fd, labels, tgts)

            cls_labels, matched, box_tgts, fg, valid = assign_roi_targets(
                roi, rv, gb, gv
            )
            from premvos_tpu.models.maskrcnn import multilevel_roi_align

            # roi_chunk caps the align's [N, p·s, W, C] intermediates: the
            # training roi count (rpn_post_nms_topk=256) is 8× the inference
            # padding, and unchunked the mask-head align alone holds ~GBs
            # per image at 480p-finetune shapes (docs/MEMORY_BUDGET.md).
            rf = multilevel_roi_align(f, roi, cfg.roi_align_size,
                                      roi_chunk=64)
            cls_logits, box_deltas = model.apply(
                params, rf, method=lambda m, x: m.box_head(x)
            )
            mf = multilevel_roi_align(f, roi, cfg.mask_roi_align_size,
                                      roi_chunk=64)
            m_logits = model.apply(
                params, mf, method=lambda m, x: m.mask_head(x)
            )
            m_tgts = mask_targets(
                gm, matched, roi, m_logits.shape[-1], image_hw
            )
            l_cls, l_box, l_mask = detection_loss(
                cls_logits, box_deltas, m_logits, cls_labels, box_tgts,
                m_tgts, fg, valid,
            )
            return l_rpn_cls + l_rpn_box + l_cls + l_box + l_mask

        if seeds is not None:
            keys = jax.vmap(jax.random.PRNGKey)(seeds)
        else:
            keys = jax.random.split(rng if rng is not None else jax.random.PRNGKey(0), b)
        losses = jax.vmap(
            lambda fl, fd, f, roi, rv, gb, gm, gv, key: per_image(
                (fl, fd, f, roi, rv, gb, gm, gv, key)
            )
        )(flat_logits, flat_deltas, feats, rois, roi_valid,
          gt_boxes, gt_masks, gt_valid, keys)
        return jnp.mean(losses)

    return loss_fn
