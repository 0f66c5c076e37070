"""Stage 1: category-agnostic mask proposals (SURVEY.md C1, call stack §3.1).

Reference flow: per-frame Python loop → TF sess.run → CPU mask paste → JSON
on disk. Here: one jitted function over a frame batch; outputs stay in HBM as
padded arrays. The 28×28 mask logits remain in box frame; downstream stages
paste/crop as needed (ops.masks.paste_mask).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from premvos_tpu.data.preprocess import normalize


@partial(jax.jit, static_argnames=("model",))
def run_proposals(model, params, images, anchors):
    """images: [T, H, W, 3] raw RGB (uint8 or [0,1]); H, W 32-multiples.

    Returns dict of padded arrays:
      boxes [T, N, 4], scores [T, N], valid [T, N], mask_logits [T, N, 28, 28].
    """
    x = normalize(images)
    return model.apply(params, x, anchors)


def proposal_masks_fullres(boxes, mask_logits, valid, height, width):
    """Paste per-proposal box-frame mask logits to full-res soft masks.

    [N, 4], [N, M, M], [N] → [N, height, width] probabilities (0 where
    invalid). Heavy (N dense canvases) — call per frame inside the merge
    scan, not over the whole sequence.
    """
    probs = jax.nn.sigmoid(mask_logits.astype(jnp.float32))

    from premvos_tpu.ops.masks import paste_mask

    pasted = jax.vmap(paste_mask, in_axes=(0, 0, None, None))(
        probs, boxes, height, width
    )
    return pasted * valid[:, None, None].astype(pasted.dtype)
