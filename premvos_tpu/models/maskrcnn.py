"""Category-agnostic Mask R-CNN proposal generator (SURVEY.md C1).

Reference: the TF Mask R-CNN stage (`model.py`: `rpn_head`,
`generate_rpn_proposals`, `roi_align`, `fastrcnn_head`, `maskrcnn_head`;
unverified — mount was empty). PReMVOS runs it category-agnostic with a low
score threshold to keep ~20 high-recall proposals per frame (paper §3.1).

TPU-first differences from the reference:
  * every tensor is fixed-shape; proposal/detection counts are padded with
    validity masks (the single most important design decision for XLA),
  * RoIAlign is the MXU matmul formulation, computed on all four FPN levels
    and one-hot-combined per RoI (static shapes beat dynamic routing on TPU),
  * the whole forward is one jittable function of (params, image batch).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from premvos_tpu.config import ProposalConfig
from premvos_tpu.models.fpn import FPN, FPN_STRIDES
from premvos_tpu.models.heads import BoxHead, MaskHead
from premvos_tpu.models.resnet import ResNet
from premvos_tpu.models.rpn import RPNHead, generate_proposals
from premvos_tpu.ops.boxes import box_area, clip_boxes, decode_boxes
from premvos_tpu.ops.nms import nms
from premvos_tpu.ops.roi_align import roi_align

ALIGN_LEVELS = ("P2", "P3", "P4", "P5")


def roi_levels(boxes: jnp.ndarray) -> jnp.ndarray:
    """FPN level assignment: floor(4 + log2(sqrt(area)/224)), clipped to 2..5."""
    scale = jnp.sqrt(jnp.maximum(box_area(boxes), 1e-6))
    lvl = jnp.floor(4.0 + jnp.log2(scale / 224.0 + 1e-12))
    return jnp.clip(lvl, 2, 5).astype(jnp.int32)


def multilevel_roi_align(
    feats: dict, boxes: jnp.ndarray, output_size: int, sampling_ratio: int = 2,
    roi_chunk: int | None = None,
) -> jnp.ndarray:
    """RoIAlign over P2..P5 for one image: compute on every level, select by
    the FPN assignment (static shapes; 4× FLOPs but MXU-bound).

    roi_chunk: process RoIs in lax.map chunks of this size. The matmul
    formulation materializes a [N, p·s, W_level, C] intermediate per level;
    at training shapes (N=256 rois, mask head p·s=28, P2 at 1/4 res) that is
    ~0.8 GB per image per level and dominated the fused fine-tune program's
    13.6 GB temp footprint (docs/MEMORY_BUDGET.md). Chunking caps the live
    intermediate at roi_chunk/N of that with no change in results; leave
    None on latency-critical inference paths (32 rois — already small)."""
    lvl = roi_levels(boxes)

    def _aligned(bxs, lv):
        out = None
        for i, name in enumerate(ALIGN_LEVELS):
            crop = roi_align(
                feats[name],
                bxs,
                output_size,
                sampling_ratio,
                spatial_scale=1.0 / FPN_STRIDES[name],
            )
            w = (lv == i + 2).astype(crop.dtype)[:, None, None, None]
            out = crop * w if out is None else out + crop * w
        return out

    n = boxes.shape[0]
    if not roi_chunk or n <= roi_chunk:
        return _aligned(boxes, lvl)
    pad = (-n) % roi_chunk
    bp = jnp.concatenate([boxes, jnp.zeros((pad, 4), boxes.dtype)])
    lp = jnp.concatenate([lvl, jnp.zeros((pad,), lvl.dtype)])
    out = jax.lax.map(
        lambda xs: _aligned(*xs),
        (bp.reshape(-1, roi_chunk, 4), lp.reshape(-1, roi_chunk)),
    )
    return out.reshape(-1, *out.shape[2:])[:n]


def multilevel_roi_align_auto(
    feats: dict, boxes: jnp.ndarray, output_size: int, sampling_ratio: int = 2
) -> jnp.ndarray:
    """Dispatching multilevel align: the level-sorted fused Pallas kernel on
    TPU (computes each RoI only on its assigned level), XLA 4-level path on
    CPU (or with PREMVOS_FUSED_ALIGN=0 as a kill switch).

    The kernel's scalar-prefetch operands can't batch natively, so a
    custom_vmap rule lowers a batched call (the chunked runner vmaps frames)
    to `lax.map` over the kernel — each image sorts its own RoIs by level.
    """
    import os

    use_pallas = (
        os.environ.get("PREMVOS_FUSED_ALIGN", "1") == "1"
        and jax.default_backend() != "cpu"
        # Mosaic can't shape-cast the [H, W, CB] slab to [H, W·CB] unless
        # the channel block is lane-aligned; small test/demo configs
        # (fpn_channels < 128) take the XLA path.
        and feats["P2"].shape[-1] % 128 == 0
    )
    if not use_pallas:
        return multilevel_roi_align(feats, boxes, output_size, sampling_ratio)

    from premvos_tpu.ops.pallas.multilevel_roi_align_pallas import (
        multilevel_roi_align_pallas,
    )

    @jax.custom_batching.custom_vmap
    def fused(p2, p3, p4, p5, b):
        return multilevel_roi_align_pallas(
            p2, p3, p4, p5, b, roi_levels(b), output_size, sampling_ratio
        )

    @fused.def_vmap
    def _rule(axis_size, in_batched, p2, p3, p4, p5, b):
        del axis_size
        if not all(in_batched):
            # Mixed batching (shouldn't occur in-repo): XLA fallback.
            axes = [0 if bt else None for bt in in_batched]
            out = jax.vmap(
                lambda a2, a3, a4, a5, bb: multilevel_roi_align(
                    {"P2": a2, "P3": a3, "P4": a4, "P5": a5}, bb,
                    output_size, sampling_ratio,
                ),
                in_axes=axes,
            )(p2, p3, p4, p5, b)
            return out, True
        out = jax.lax.map(
            lambda xs: multilevel_roi_align_pallas(
                *xs[:4], xs[4], roi_levels(xs[4]), output_size, sampling_ratio
            ),
            (p2, p3, p4, p5, b),
        )
        return out, True

    return fused(feats["P2"], feats["P3"], feats["P4"], feats["P5"], boxes)


class MaskRCNN(nn.Module):
    cfg: ProposalConfig = ProposalConfig()
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet(
            depth=self.cfg.backbone_depth, dtype=self.dtype,
            norm=self.cfg.norm,
        )
        self.fpn = FPN(channels=self.cfg.fpn_channels, dtype=self.dtype)
        self.rpn = RPNHead(
            num_anchors=len(self.cfg.anchor_ratios),
            channels=self.cfg.fpn_channels,
            dtype=self.dtype,
        )
        self.box_head = BoxHead(num_classes=self.cfg.num_classes, dtype=self.dtype)
        self.mask_head = MaskHead(dtype=self.dtype)

    def features(self, images: jnp.ndarray) -> dict:
        """[B, H, W, 3] normalized images → {P2..P6} batched feature maps."""
        return self.fpn(self.backbone(images))

    def rpn_outputs(self, feats: dict):
        logits, deltas = {}, {}
        for lvl, f in feats.items():
            logits[lvl], deltas[lvl] = self.rpn(f)
        return logits, deltas

    def proposals(self, feats: dict, anchors: dict, image_hw):
        """Batched padded RPN proposals: [B, K, 4], [B, K], [B, K]."""
        logits, deltas = self.rpn_outputs(feats)

        def per_image(lg, dl):
            return generate_proposals(
                lg,
                dl,
                anchors,
                image_hw,
                pre_nms_topk=self.cfg.rpn_pre_nms_topk,
                post_nms_topk=self.cfg.rpn_post_nms_topk,
                nms_threshold=self.cfg.rpn_nms_threshold,
            )

        return jax.vmap(per_image)(logits, deltas)

    def detect(self, feats: dict, rois, roi_valid, image_hw,
               align_fn=multilevel_roi_align):
        """Per-image second stage: box refinement + NMS → padded detections."""
        h, w = image_hw
        cfg = self.cfg

        roi_feats = align_fn(feats, rois, cfg.roi_align_size)
        logits, deltas = self.box_head(roi_feats)
        # Class-agnostic: P(object) from a 2-way softmax.
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        scores = probs[:, 1] * roi_valid.astype(jnp.float32)
        boxes = clip_boxes(
            decode_boxes(deltas.astype(jnp.float32), rois), float(h), float(w)
        )

        idx, keep = nms(
            boxes,
            scores,
            max_outputs=cfg.detections_per_frame,
            iou_threshold=cfg.detection_nms_threshold,
            score_threshold=cfg.detection_score_threshold,
            valid=roi_valid,
        )
        safe = jnp.maximum(idx, 0)
        det_boxes = jnp.where(keep[:, None], boxes[safe], 0.0)
        det_scores = jnp.where(keep, scores[safe], 0.0)
        return det_boxes, det_scores, keep

    def masks(self, feats: dict, det_boxes, align_fn=multilevel_roi_align):
        """Per-image mask branch → [D, 2P, 2P] mask logits in box frame."""
        mf = align_fn(feats, det_boxes, self.cfg.mask_roi_align_size)
        return self.mask_head(mf)

    def __call__(self, images: jnp.ndarray, anchors: dict):
        """Full padded inference.

        Args:
          images: [B, H, W, 3], already mean/std normalized, H/W 32-multiples.
          anchors: {level: [Ni, 4]} from `models.anchors.pyramid_anchors`.

        Returns dict with per-image padded arrays:
          boxes [B, D, 4], scores [B, D], valid [B, D],
          mask_logits [B, D, 2P, 2P] (in-box frame; paste with ops.masks).
        """
        b, h, w, _ = images.shape
        feats = self.features(images)
        rois, _, roi_valid = self.proposals(feats, anchors, (h, w))

        def per_image(f, r, rv):
            det_boxes, det_scores, det_valid = self.detect(
                f, r, rv, (h, w), align_fn=multilevel_roi_align_auto
            )
            mask_logits = self.masks(
                f, det_boxes, align_fn=multilevel_roi_align_auto
            )
            return det_boxes, det_scores, det_valid, mask_logits

        # multilevel_roi_align_auto: level-sorted fused Pallas kernel on TPU
        # (lax.map'ed under this vmap via its custom_vmap rule), XLA 4-level
        # path on CPU / with PREMVOS_FUSED_ALIGN=0.
        det_boxes, det_scores, det_valid, mask_logits = jax.vmap(per_image)(
            feats, rois, roi_valid
        )
        return {
            "boxes": det_boxes,
            "scores": det_scores,
            "valid": det_valid,
            "mask_logits": mask_logits,
        }
