"""Fixed-shape non-maximum suppression.

Reference: `tf.image.non_max_suppression` (TF C++ op) used by the Mask R-CNN
stage in `generate_rpn_proposals` and final detection filtering
(MaskRCNN/model.py, unverified — reference mount was empty; see SURVEY.md
provenance note). That op returns a dynamic number of indices; under XLA
everything must be static, so this implementation is *padded*: it always
returns `max_outputs` indices (−1-padded) plus a validity mask.

Algorithm: exact greedy NMS. Sort by score, build the dense IoU matrix once,
then a sequential `fori_loop` flips suppression bits row by row. O(N²) memory,
O(N) sequential steps of O(N) vector work each — the matrix rides the VPU and
the loop is short (N = pre-NMS top-k, ≤ a few thousand).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from premvos_tpu.ops.boxes import box_iou

NEG_INF = -1e10


def nms_reference(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_outputs: int,
    iou_threshold: float = 0.5,
    score_threshold: float = float(NEG_INF),
    valid: jnp.ndarray | None = None,
):
    """Greedy NMS over padded inputs.

    Args:
      boxes: [N, 4] xyxy.
      scores: [N].
      max_outputs: static output count.
      iou_threshold: suppress boxes with IoU > threshold vs a kept box.
      score_threshold: boxes at or below are dropped.
      valid: optional [N] bool mask of real (non-padding) rows.

    Returns:
      indices: [max_outputs] int32 into the input arrays, −1 where empty.
      keep: [max_outputs] bool validity of each output slot.
    """
    n = boxes.shape[0]
    if valid is not None:
        scores = jnp.where(valid, scores, NEG_INF)

    order = jnp.argsort(-scores)
    boxes_s = boxes[order]
    scores_s = scores[order]
    alive = scores_s > score_threshold

    iou = box_iou(boxes_s, boxes_s)
    col = jnp.arange(n)

    def body(i, suppressed):
        keep_i = jnp.logical_and(~suppressed[i], alive[i])
        new_sup = jnp.logical_and(keep_i, iou[i] > iou_threshold)
        new_sup = jnp.logical_and(new_sup, col > i)
        return jnp.logical_or(suppressed, new_sup)

    suppressed = jax.lax.fori_loop(0, n, body, jnp.zeros((n,), bool))
    kept = jnp.logical_and(~suppressed, alive)

    # Compact kept indices (in score order) into the first slots.
    rank = jnp.cumsum(kept) - 1
    slot = jnp.where(jnp.logical_and(kept, rank < max_outputs), rank, max_outputs)
    indices = (
        jnp.full((max_outputs + 1,), -1, jnp.int32)
        .at[slot]
        .set(order.astype(jnp.int32))[:max_outputs]
    )
    keep = indices >= 0
    return indices, keep


def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_outputs: int,
    iou_threshold: float = 0.5,
    score_threshold: float = float(NEG_INF),
    valid: jnp.ndarray | None = None,
):
    """Dispatching entry point (same contract as `nms_reference`).

    On TPU the Pallas sweep (ops/pallas/nms_pallas.py) is the default —
    VMEM-resident, no N² IoU matrix in HBM, measured 2.4× faster at RPN
    scale (N=5120) with exact parity. PREMVOS_PALLAS=0 forces the jnp path;
    CPU always uses the jnp path.
    """
    import os

    import jax

    use_pallas = (
        os.environ.get("PREMVOS_PALLAS", "1") != "0"
        and jax.default_backend() != "cpu"
    )
    if use_pallas:
        from premvos_tpu.ops.pallas.nms_pallas import nms_pallas

        # NMS outputs (indices, keep) are integer/boolean — no tangent
        # space. stop_gradient keeps autodiff (detection training on TPU)
        # from trying to linearize through the Pallas kernel.
        boxes = jax.lax.stop_gradient(boxes)
        scores = jax.lax.stop_gradient(scores)
        return nms_pallas(
            boxes, scores, max_outputs, iou_threshold, score_threshold, valid
        )
    return nms_reference(
        boxes, scores, max_outputs, iou_threshold, score_threshold, valid
    )
