"""Stage 5: merging & tracking (SURVEY.md C5, call stack §3.5).

Reference flow: a pure Python/numpy/pycocotools loop per frame per object —
warp previous masks by flow, score every proposal per object
(objectness + ReID similarity + warped-mask IoU − inter-object overlap),
greedy-select one proposal per object, resolve pixel conflicts by score,
write an indexed PNG. Supports objects disappearing and re-appearing (the
ReID term re-acquires them).

TPU-native design: everything is a fixed-shape reduction —
  * warping: batched `resample2d` gather,
  * the score matrix [K objects × N proposals]: one soft-IoU matmul, one
    embedding-distance matmul, broadcasts,
  * greedy assignment: a K-step `lax.scan` over masked argmaxes (K ≤ 8),
  * pixel conflict resolution: per-pixel masked argmax,
so a whole frame's merge is one fused XLA program with no host round-trips,
and the frame loop is a `lax.scan` carry (prev masks), per BASELINE.json.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from premvos_tpu.config import MergeConfig
from premvos_tpu.ops.masks import soft_mask_iou
from premvos_tpu.stages.flow import warp_masks_coarse
from premvos_tpu.stages.reid import reid_similarity

NEG = -1e9


class TrackState(NamedTuple):
    """Carry of the per-sequence tracking scan."""

    prev_masks: jnp.ndarray  # [K, H, W] soft masks in the current frame
    ref_emb: jnp.ndarray  # [K, E] reference embeddings (frame-0 GT anchor;
    # optionally EMA-adapted when MergeConfig.reid_ema > 0)
    active: jnp.ndarray  # [K] bool — object exists in this sequence
    staleness: jnp.ndarray  # [K] int32 — frames since the track was last
    # selected (0 while tracked; drives MergeConfig.warp_decay)


def init_state(gt_masks, gt_emb, num_objects) -> TrackState:
    """First-frame GT masks [K, H, W] + embeddings [K, E] → initial state.

    num_objects: [  ] or scalar int — how many of the K padded slots are real.
    """
    k = gt_masks.shape[0]
    active = jnp.arange(k) < num_objects
    return TrackState(
        prev_masks=gt_masks.astype(jnp.float32),
        ref_emb=gt_emb.astype(jnp.float32),
        active=active,
        staleness=jnp.zeros((k,), jnp.int32),
    )


def score_matrix(
    state: TrackState,
    warped: jnp.ndarray,
    prop_masks: jnp.ndarray,
    prop_scores: jnp.ndarray,
    prop_emb: jnp.ndarray,
    prop_valid: jnp.ndarray,
    cfg: MergeConfig,
):
    """([K, N] merge scores, [K, N] raw ReID similarities); invalid score
    entries at NEG. The similarity matrix is returned alongside so the
    caller can apply the ReID-gated floor relief (MergeConfig
    .reid_reacquire) to the picked proposal without recomputing it."""
    warp_iou = soft_mask_iou(warped, prop_masks)  # [K, N]
    sim = reid_similarity(state.ref_emb, prop_emb, cfg.reid_sigma)  # [K, N]

    # Decay the warp term for coasting tracks: a prior that has been warped
    # forward `staleness` frames without confirmation drifts; at warp_decay<1
    # ReID progressively takes over re-acquisition (warp_decay=1.0 ==
    # reference semantics — staleness has no effect).
    decay = jnp.power(
        jnp.float32(cfg.warp_decay), state.staleness.astype(jnp.float32)
    )  # [K]

    # Penalty: proposal overlap with *other* objects' warped masks.
    # Σ_{j≠k} warped_j = Σ_j warped_j − warped_k — no [K, K, H, W] tensor.
    # Each track's mask enters the union scaled by its own staleness decay:
    # a coasting ghost must not suppress another object's correct proposal
    # (tests/test_tracker_swap.py reproduces the ghost-squat false-absent
    # this prevents; on the real benchmark the change measured neutral —
    # docs/SELECTION_DIAGNOSIS.md). At warp_decay=1.0 (reference semantics)
    # this is exactly the unscaled union.
    w_dec = warped * decay[:, None, None]  # [K, H, W]
    total = jnp.sum(w_dec, axis=0, keepdims=True)  # [1, H, W]
    other_union = jnp.clip(total - w_dec, 0.0, 1.0)  # [K, H, W]
    overlap = soft_mask_iou(other_union, prop_masks)  # [K, N]
    s = (
        cfg.w_objectness * prop_scores[None, :]
        + cfg.w_reid * sim
        + cfg.w_warp * decay[:, None] * warp_iou
        - cfg.w_overlap * overlap
    )
    ok = jnp.logical_and(state.active[:, None], prop_valid[None, :])
    return jnp.where(ok, s, NEG), jnp.where(ok, sim, 0.0)


def greedy_assign(scores: jnp.ndarray):
    """Greedy bipartite assignment on a [K, N] score matrix.

    Repeatedly takes the global best (object, proposal) pair and removes
    both. Returns (assign [K] int32 — proposal index or −1,
    assign_score [K] float32 — NEG where unassigned).
    """
    k, n = scores.shape

    def body(carry, _):
        s, assign, a_score = carry
        flat = jnp.argmax(s)
        ki, ni = flat // n, flat % n
        val = s[ki, ni]
        do = val > NEG / 2
        assign = jnp.where(
            do, assign.at[ki].set(ni.astype(jnp.int32)), assign
        )
        a_score = jnp.where(do, a_score.at[ki].set(val), a_score)
        s = jnp.where(do, s.at[ki, :].set(NEG).at[:, ni].set(NEG), s)
        return (s, assign, a_score), None

    init = (
        scores,
        jnp.full((k,), -1, jnp.int32),
        jnp.full((k,), NEG, jnp.float32),
    )
    (_, assign, a_score), _ = jax.lax.scan(body, init, None, length=k)
    return assign, a_score


def resolve_pixels(
    sel_masks: jnp.ndarray,
    sel_scores: jnp.ndarray,
    present: jnp.ndarray,
    threshold: float = 0.5,
) -> jnp.ndarray:
    """[K, H, W] selected soft masks → [H, W] int32 labels (0 = background).

    A pixel goes to the highest-scoring present object whose mask covers it.
    """
    cover = jnp.logical_and(sel_masks > threshold, present[:, None, None])
    pix = jnp.where(cover, sel_scores[:, None, None], NEG)
    best = jnp.argmax(pix, axis=0)
    any_cover = jnp.any(cover, axis=0)
    return jnp.where(any_cover, best + 1, 0).astype(jnp.int32)


def merge_frame(
    state: TrackState,
    prop_masks: jnp.ndarray,
    prop_scores: jnp.ndarray,
    prop_emb: jnp.ndarray,
    prop_valid: jnp.ndarray,
    flow_back: jnp.ndarray,
    cfg: MergeConfig = MergeConfig(),
    intro: tuple | None = None,
):
    """One tracking step.

    Args:
      state: previous TrackState.
      prop_masks: [N, H, W] refined soft masks for this frame.
      prop_scores / prop_emb / prop_valid: [N] / [N, E] / [N].
      flow_back: [H, W, 2] flow (current → previous frame) for backward warp.
      intro: optional (new_active [K] bool, intro_masks [K, H, W]) —
        YouTube-VOS-style mid-sequence object introduction: objects becoming
        active THIS frame adopt their GT annotation mask directly and join
        tracking from the next frame.

    Returns (new_state, labels [H, W] int32, info dict).
    """
    new_active = None
    if intro is not None:
        # On its annotated frame a new object emits its annotation verbatim
        # and joins proposal assignment from the NEXT frame (YT-VOS
        # protocol); it is excluded from this frame's assignment.
        new_active, intro_masks = intro
    warped = warp_masks_coarse(
        state.prev_masks, flow_back, cfg.warp_stride, cfg.warp_impl
    )  # [K, H, W]
    s, sim = score_matrix(
        state, warped, prop_masks, prop_scores, prop_emb, prop_valid, cfg
    )
    assign, a_score = greedy_assign(s)

    picked = jnp.maximum(assign, 0)
    sel = prop_masks[picked]  # [K, H, W]
    # Acceptance: total score above the anti-swap floor, OR a confident
    # ReID match (sim ≥ reid_reacquire) — the re-acquisition relief for
    # camouflage objects whose warp/objectness terms are near zero after
    # an occlusion (docs/SELECTION_DIAGNOSIS.md "false_absent" half).
    sim_picked = jnp.take_along_axis(sim, picked[:, None], axis=1)[:, 0]
    accept = jnp.logical_or(
        a_score > cfg.new_object_score_floor,
        sim_picked >= cfg.reid_reacquire,
    )
    present = jnp.logical_and(assign >= 0, accept)
    present = jnp.logical_and(present, state.active)
    sel = sel * present[:, None, None].astype(sel.dtype)

    labels = resolve_pixels(sel, a_score, present, cfg.mask_threshold)

    # Next-frame prior: the selected mask when present, else the warped
    # hypothesis (lets tracking coast through brief disappearance; ReID
    # re-acquires on re-appearance).
    new_prev = jnp.where(present[:, None, None], sel, warped)
    staleness = jnp.where(present, 0, state.staleness + 1)

    # Optional appearance adaptation: EMA of the assigned proposal's
    # embedding into the reference anchor (reid_ema=0.0 == reference
    # semantics: the frame-0 GT embedding is the fixed anchor).
    ref_emb = state.ref_emb
    if isinstance(cfg.reid_ema, jnp.ndarray) or float(cfg.reid_ema) > 0.0:
        a = jnp.float32(cfg.reid_ema) * present.astype(jnp.float32)[:, None]
        ref_emb = (1.0 - a) * ref_emb + a * prop_emb[picked].astype(
            jnp.float32
        )
    active = state.active

    if new_active is not None:
        # Introduced objects: annotation wins all pixel conflicts this frame.
        k = new_prev.shape[0]
        ids = jnp.arange(1, k + 1, dtype=jnp.int32)[:, None, None]
        cover = jnp.logical_and(
            intro_masks > cfg.mask_threshold, new_active[:, None, None]
        )
        intro_lab = jnp.max(jnp.where(cover, ids, 0), axis=0)
        labels = jnp.where(intro_lab > 0, intro_lab, labels)
        new_prev = jnp.where(new_active[:, None, None], intro_masks, new_prev)
        staleness = jnp.where(new_active, 0, staleness)
        active = jnp.logical_or(active, new_active)

    new_state = TrackState(new_prev, ref_emb, active, staleness)
    info = {"assign": assign, "score": a_score, "present": present}
    return new_state, labels, info
