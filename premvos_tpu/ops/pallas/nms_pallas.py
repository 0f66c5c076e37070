"""Pallas TPU kernel: greedy NMS suppression sweep.

Replaces `tf.image.non_max_suppression` (TF C++ op; SURVEY.md C10).

The jnp reference (ops.nms) materializes the full [N, N] IoU matrix in HBM
and then runs the sequential sweep. This kernel keeps everything in VMEM and
computes each row's IoU on the fly inside the sweep: boxes live as four
[1, N] coordinate rows, the suppression state is a VMEM scratch vector, and
per-iteration scalar extraction uses masked reductions (TPU lanes don't do
cheap dynamic extraction). O(N²) VPU work, zero HBM traffic inside the loop,
no N² intermediate.

Inputs must be pre-sorted by score (descending) — the public wrapper
`nms_pallas` handles sorting, padding to lane multiples and index compaction,
and matches `ops.nms.nms_reference` exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from premvos_tpu.ops.nms import NEG_INF


def _nms_kernel(boxes_ref, alive_ref, keep_ref, *, n, iou_threshold):
    # boxes_ref: [8, N] rows = x1, y1, x2, y2 (padded to sublane 8).
    x1 = boxes_ref[0:1, :]
    y1 = boxes_ref[1:2, :]
    x2 = boxes_ref[2:3, :]
    y2 = boxes_ref[3:4, :]
    areas = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    alive = alive_ref[0:1, :]

    keep_ref[0:1, :] = jnp.zeros((1, n), jnp.float32)

    def body(i, suppressed):
        sel = (col == i).astype(jnp.float32)

        def pick(v):
            return jnp.sum(v * sel)

        keep_i = jnp.logical_and(pick(suppressed) == 0.0, pick(alive) > 0.0)

        ix1 = jnp.maximum(x1, pick(x1))
        iy1 = jnp.maximum(y1, pick(y1))
        ix2 = jnp.minimum(x2, pick(x2))
        iy2 = jnp.minimum(y2, pick(y2))
        inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
        union = areas + pick(areas) - inter
        iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)

        sup = jnp.logical_and(iou > iou_threshold, col > i)
        sup = jnp.logical_and(sup, keep_i)
        keep_ref[0:1, :] = keep_ref[0:1, :] + sel * keep_i.astype(jnp.float32)
        return jnp.maximum(suppressed, sup.astype(jnp.float32))

    jax.lax.fori_loop(0, n, body, jnp.zeros((1, n), jnp.float32))


@functools.partial(
    jax.jit,
    static_argnames=("max_outputs", "iou_threshold", "score_threshold", "interpret"),
)
def nms_pallas(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_outputs: int,
    iou_threshold: float = 0.5,
    score_threshold: float = float(NEG_INF),
    valid: jnp.ndarray | None = None,
    interpret: bool = False,
):
    """Same contract as ops.nms.nms_reference: returns (indices, keep)."""
    n = boxes.shape[0]
    if valid is not None:
        scores = jnp.where(valid, scores, NEG_INF)

    order = jnp.argsort(-scores)
    boxes_s = boxes[order].astype(jnp.float32)
    scores_s = scores[order]
    alive = (scores_s > score_threshold).astype(jnp.float32)

    n_pad = (-n) % 128
    np_ = n + n_pad
    rows = jnp.zeros((8, np_), jnp.float32)
    rows = rows.at[:4, :n].set(boxes_s.T)
    alive_p = jnp.zeros((8, np_), jnp.float32).at[0, :n].set(alive)

    keep_f = pl.pallas_call(
        functools.partial(_nms_kernel, n=np_, iou_threshold=iou_threshold),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, np_), jnp.float32),
        interpret=interpret,
    )(rows, alive_p)

    kept = keep_f[0, :n] > 0.5
    rank = jnp.cumsum(kept) - 1
    slot = jnp.where(
        jnp.logical_and(kept, rank < max_outputs), rank, max_outputs
    )
    indices = (
        jnp.full((max_outputs + 1,), -1, jnp.int32)
        .at[slot]
        .set(order.astype(jnp.int32))[:max_outputs]
    )
    return indices, indices >= 0
