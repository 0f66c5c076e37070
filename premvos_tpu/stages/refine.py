"""Stage 2: proposal refinement (SURVEY.md C2, call stack §3.3).

Reference flow: read proposal JSON → decode RLE → crop 385×385 around the
margin-expanded box with an extra coarse-mask channel → TF sess.run → RLE →
rewrite JSON. Here: pure functions from (image, boxes, coarse mask logits) to
refined full-res soft masks, all in HBM.

Crop extraction and paste-back are the MXU matmul interpolation ops
(ops.roi_align.crop_and_resize / ops.masks.paste_mask), so the whole stage is
matmuls + a dense conv net — the most TPU-friendly stage.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from premvos_tpu.ops.masks import paste_mask
from premvos_tpu.ops.roi_align import crop_and_resize


def expand_boxes(boxes: jnp.ndarray, margin: float, height, width) -> jnp.ndarray:
    """Margin-expand xyxy boxes and clip to the image (reference: ~50 px)."""
    x1 = jnp.clip(boxes[:, 0] - margin, 0, width)
    y1 = jnp.clip(boxes[:, 1] - margin, 0, height)
    x2 = jnp.clip(boxes[:, 2] + margin, 0, width)
    y2 = jnp.clip(boxes[:, 3] + margin, 0, height)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


def interp_precision(name: str | None):
    """RefineConfig.interp_precision string → jax.lax.Precision (None→None)."""
    return None if name is None else _PRECISIONS[name]


def make_refine_crops(
    image: jnp.ndarray,
    boxes: jnp.ndarray,
    mask_logits: jnp.ndarray,
    crop_size: int = 385,
    margin: float = 50.0,
    precision=None,
):
    """Build the 4-channel refinement inputs for one frame.

    image: [H, W, 3] normalized; boxes: [N, 4] xyxy; mask_logits: [N, M, M]
    box-frame coarse masks. Returns (crops [N, S, S, 4], crop_boxes [N, 4]).
    """
    h, w, _ = image.shape
    crop_boxes = expand_boxes(boxes, margin, h, w)

    # RGB channels: crop_and_resize wants normalized [y1, x1, y2, x2].
    norm = jnp.stack(
        [
            crop_boxes[:, 1] / (h - 1),
            crop_boxes[:, 0] / (w - 1),
            crop_boxes[:, 3] / (h - 1),
            crop_boxes[:, 2] / (w - 1),
        ],
        axis=-1,
    )
    rgb = crop_and_resize(image, norm, crop_size, precision)  # [N, S, S, 3]

    # Mask channel: paste the coarse box-frame mask into crop coordinates.
    # The proposal box, expressed in the crop frame, is an affine remap of
    # (boxes − crop origin) by the crop scale.
    cw = jnp.maximum(crop_boxes[:, 2] - crop_boxes[:, 0], 1e-6)
    ch = jnp.maximum(crop_boxes[:, 3] - crop_boxes[:, 1], 1e-6)
    sx = crop_size / cw
    sy = crop_size / ch
    box_in_crop = jnp.stack(
        [
            (boxes[:, 0] - crop_boxes[:, 0]) * sx,
            (boxes[:, 1] - crop_boxes[:, 1]) * sy,
            (boxes[:, 2] - crop_boxes[:, 0]) * sx,
            (boxes[:, 3] - crop_boxes[:, 1]) * sy,
        ],
        axis=-1,
    )
    probs = jax.nn.sigmoid(mask_logits.astype(jnp.float32))
    mask_ch = jax.vmap(
        lambda m, b: paste_mask(m, b, crop_size, crop_size, precision)
    )(probs, box_in_crop)
    crops = jnp.concatenate([rgb, mask_ch[..., None]], axis=-1)
    return crops, crop_boxes


def run_refine(model, params, image, boxes, mask_logits, valid, cfg):
    """Refine one frame's proposals → crop-frame logits [N, S, S].

    Keep outputs in crop frame (HBM-light); paste per frame in the merge scan
    via `refined_fullres`.
    """
    crops, crop_boxes = make_refine_crops(
        image, boxes, mask_logits, cfg.crop_size, cfg.box_margin,
        interp_precision(cfg.interp_precision),
    )
    logits = model.apply(params, crops)  # [N, S, S]
    logits = logits * valid[:, None, None].astype(logits.dtype)
    return logits, crop_boxes


def refined_fullres(
    refine_logits, crop_boxes, valid, height, width, precision=None
):
    """[N, S, S] crop-frame logits → [N, H, W] soft masks (0 where invalid)."""
    probs = jax.nn.sigmoid(refine_logits.astype(jnp.float32))
    pasted = jax.vmap(
        lambda m, b: paste_mask(m, b, height, width, precision)
    )(probs, crop_boxes)
    return pasted * valid[:, None, None].astype(pasted.dtype)
