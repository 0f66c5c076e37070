"""Stage 4: ReID embeddings (SURVEY.md C4, call stack §3.5).

Reference flow: per-proposal crop → TF forward → append the 128-d vector to
the proposal JSON. Here: crops are extracted with the MXU crop op and
embedded as one batch; the pairwise-distance matrix used by the merge stage
is a single matmul.
"""

from __future__ import annotations

import jax.numpy as jnp

from premvos_tpu.ops.roi_align import crop_and_resize


def make_reid_crops(image, boxes, crop_size: int = 128):
    """[H, W, 3] image + [N, 4] xyxy → [N, S, S, 3] crops."""
    h, w, _ = image.shape
    norm = jnp.stack(
        [
            boxes[:, 1] / (h - 1),
            boxes[:, 0] / (w - 1),
            boxes[:, 3] / (h - 1),
            boxes[:, 2] / (w - 1),
        ],
        axis=-1,
    )
    return crop_and_resize(image, norm, crop_size)


def run_reid(model, params, image, boxes, valid, crop_size: int = 128):
    """Embed one frame's proposal crops → [N, E] (zero rows where invalid)."""
    crops = make_reid_crops(image, boxes, crop_size)
    emb = model.apply(params, crops)
    return emb * valid[:, None].astype(emb.dtype)


def pairwise_sq_distances(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Squared Euclidean distance matrix [K, E] × [N, E] → [K, N] (one MXU
    matmul plus rank-1 terms)."""
    aa = jnp.sum(a * a, axis=-1)[:, None]
    bb = jnp.sum(b * b, axis=-1)[None, :]
    ab = a @ b.T
    return jnp.maximum(aa + bb - 2.0 * ab, 0.0)


def reid_similarity(
    ref_emb: jnp.ndarray, prop_emb: jnp.ndarray, sigma: float = 1.0
) -> jnp.ndarray:
    """exp(−d²/σ²) similarity in [0, 1], [K, N]. Distances are computed on
    L2-normalized embeddings so σ is scale-free."""

    def _norm(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-6)

    d2 = pairwise_sq_distances(_norm(ref_emb), _norm(prop_emb))
    return jnp.exp(-d2 / (sigma * sigma))
