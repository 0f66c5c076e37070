"""Re-appearance: an object that vanishes must be re-acquired by ReID when a
matching proposal returns — the PReMVOS merge stage's signature behavior."""

import jax.numpy as jnp
import numpy as np

from premvos_tpu.config import MergeConfig
from premvos_tpu.stages.merge import init_state, merge_frame


def test_reid_reacquires_after_disappearance():
    h = w = 16
    gt = np.zeros((2, h, w), np.float32)
    gt[0, 2:6, 2:6] = 1.0
    gt[1, 10:14, 10:14] = 1.0
    gt_emb = np.eye(2, 8, dtype=np.float32)
    state = init_state(jnp.array(gt), jnp.array(gt_emb), 2)
    zero_flow = jnp.zeros((h, w, 2))
    cfg = MergeConfig(new_object_score_floor=0.1)

    # Frame 1: object 1 (index 0) has NO proposal → disappears.
    props = np.zeros((3, h, w), np.float32)
    props[0, 10:14, 10:14] = 1.0  # only object 2's proposal
    emb = np.zeros((3, 8), np.float32)
    emb[0, 1] = 1.0
    state, labels, info = merge_frame(
        state, jnp.array(props), jnp.array([0.9, 0.0, 0.0]), jnp.array(emb),
        jnp.array([True, False, False]), zero_flow, cfg,
    )
    assert not bool(info["present"][0])
    assert (np.asarray(labels) != 1).all()

    # Frames 2-3: still gone → the warped hypothesis decays/coasts.
    for _ in range(2):
        state, labels, info = merge_frame(
            state, jnp.array(props), jnp.array([0.9, 0.0, 0.0]),
            jnp.array(emb), jnp.array([True, False, False]), zero_flow, cfg,
        )

    # Frame 4: object 1 re-appears ELSEWHERE (moved) with a matching
    # embedding → ReID term re-acquires it even though warp-IoU is ~0.
    props2 = np.zeros((3, h, w), np.float32)
    props2[0, 10:14, 10:14] = 1.0
    props2[1, 6:10, 8:12] = 1.0  # new location, far from original
    emb2 = np.zeros((3, 8), np.float32)
    emb2[0, 1] = 1.0
    emb2[1, 0] = 1.0  # matches object 1's reference embedding
    state, labels, info = merge_frame(
        state, jnp.array(props2), jnp.array([0.9, 0.9, 0.0]),
        jnp.array(emb2), jnp.array([True, True, False]), zero_flow, cfg,
    )
    assert bool(info["present"][0])
    assert int(info["assign"][0]) == 1
    lab = np.asarray(labels)
    assert (lab[6:10, 8:12] == 1).all()


def test_warp_decay_downweights_stale_prior():
    """A coasting track's stale warped prior must lose to ReID at
    re-acquisition when warp_decay < 1 (MergeConfig.warp_decay; defaults to
    1.0 = reference semantics where the stale prior counts fully)."""
    h = w = 16
    gt = np.zeros((2, h, w), np.float32)
    gt[0, 2:6, 2:6] = 1.0
    gt[1, 10:14, 10:14] = 1.0
    gt_emb = np.eye(2, 8, dtype=np.float32)
    zero_flow = jnp.zeros((h, w, 2))

    # Object 1 goes unseen for 3 frames (only obj 2's proposal exists), so
    # its prior coasts at the ORIGINAL location while the object moved on.
    props_gone = np.zeros((3, h, w), np.float32)
    props_gone[0, 10:14, 10:14] = 1.0
    emb_gone = np.zeros((3, 8), np.float32)
    emb_gone[0, 1] = 1.0
    # Re-appearance frame: a distractor sits exactly on the stale prior
    # (high warp-IoU, wrong identity) vs the true object elsewhere (zero
    # warp-IoU, right identity).
    props_re = np.zeros((3, h, w), np.float32)
    props_re[0, 10:14, 10:14] = 1.0   # obj 2
    props_re[1, 2:6, 2:6] = 1.0       # distractor on obj 1's stale prior
    props_re[2, 6:10, 8:12] = 1.0     # obj 1, moved
    emb_re = np.zeros((3, 8), np.float32)
    emb_re[0, 1] = 1.0
    emb_re[1] = 0.35 * np.array([1, 0, 0, 0, 0, 0, 0, 1], np.float32)
    emb_re[2, 0] = 1.0                # matches obj 1's reference exactly

    def run(cfg):
        state = init_state(jnp.array(gt), jnp.array(gt_emb), 2)
        for _ in range(3):
            state, _, _ = merge_frame(
                state, jnp.array(props_gone), jnp.array([0.9, 0.0, 0.0]),
                jnp.array(emb_gone), jnp.array([True, False, False]),
                zero_flow, cfg,
            )
        assert int(state.staleness[0]) == 3
        assert int(state.staleness[1]) == 0
        state, _, info = merge_frame(
            state, jnp.array(props_re), jnp.array([0.9, 0.9, 0.9]),
            jnp.array(emb_re), jnp.array([True, True, True]), zero_flow, cfg,
        )
        return int(info["assign"][0])

    # Reference semantics: stale warp (IoU 1.0 with the parked distractor)
    # plus its partial reid similarity outweighs pure reid → wrong pick.
    assert run(MergeConfig(w_warp=2.0)) == 1
    # With decay 0.5^3 the stale prior is discounted → ReID wins.
    assert run(MergeConfig(w_warp=2.0, warp_decay=0.5)) == 2


def test_reid_reacquire_relieves_floor_for_confident_match():
    """A camouflage re-appearance whose ONLY strong term is ReID must be
    accepted when sim ≥ reid_reacquire even though its total score misses
    the anti-swap floor — and a wrong-identity proposal (low sim) must
    still be blocked by the floor (docs/SELECTION_DIAGNOSIS.md: the
    false_absent half of the floor trade-off)."""
    h = w = 16
    gt = np.zeros((1, h, w), np.float32)
    gt[0, 2:6, 2:6] = 1.0
    gt_emb = np.zeros((1, 8), np.float32)
    gt_emb[0, 0] = 1.0
    zero_flow = jnp.zeros((h, w, 2))

    def reappear(cfg, match_emb):
        state = init_state(jnp.array(gt), jnp.array(gt_emb), 1)
        # frame 1: gone (no valid proposal) → track coasts
        state, _, _ = merge_frame(
            state, jnp.zeros((2, h, w)), jnp.array([0.0, 0.0]),
            jnp.zeros((2, 8)), jnp.array([False, False]), zero_flow, cfg,
        )
        # frame 2: re-appearance elsewhere, objectness ~0 (camouflage),
        # warp-IoU 0 (moved) — total score is essentially w_reid·sim
        props = np.zeros((2, h, w), np.float32)
        props[0, 9:13, 9:13] = 1.0
        emb = np.zeros((2, 8), np.float32)
        emb[0] = match_emb
        state, labels, info = merge_frame(
            state, jnp.array(props), jnp.array([0.05, 0.0]),
            jnp.array(emb), jnp.array([True, False]), zero_flow, cfg,
        )
        return bool(info["present"][0]), np.asarray(labels)

    right = np.array([1, 0, 0, 0, 0, 0, 0, 0], np.float32)
    wrong = np.array([0, 1, 0, 0, 0, 0, 0, 0], np.float32)
    floor_cfg = dict(new_object_score_floor=1.2, reid_sigma=1.0)

    # floor alone: the re-appearance is lost (score ≈ 1.05 < 1.2)
    present, _ = reappear(MergeConfig(**floor_cfg), right)
    assert not present
    # with the relief at 0.9: exact-match sim = 1.0 ≥ 0.9 → re-acquired
    present, labels = reappear(
        MergeConfig(**floor_cfg, reid_reacquire=0.9), right
    )
    assert present and (labels[9:13, 9:13] == 1).all()
    # wrong identity (sim = exp(−2) ≈ 0.14 < 0.9): floor still blocks —
    # the relief must not reopen the identity-swap hole
    present, _ = reappear(
        MergeConfig(**floor_cfg, reid_reacquire=0.9), wrong
    )
    assert not present


def test_reid_ema_adapts_reference_embedding():
    """reid_ema > 0 folds the assigned proposal's embedding into the track
    anchor; at 0.0 (default) the anchor is the immutable frame-0 GT."""
    h = w = 16
    gt = np.zeros((1, h, w), np.float32)
    gt[0, 2:6, 2:6] = 1.0
    gt_emb = np.zeros((1, 8), np.float32)
    gt_emb[0, 0] = 1.0
    zero_flow = jnp.zeros((h, w, 2))
    props = np.zeros((2, h, w), np.float32)
    props[0, 2:6, 2:6] = 1.0
    emb = np.zeros((2, 8), np.float32)
    emb[0, 1] = 1.0  # drifted appearance

    def step(cfg, state):
        return merge_frame(
            state, jnp.array(props), jnp.array([0.9, 0.0]), jnp.array(emb),
            jnp.array([True, False]), zero_flow, cfg,
        )

    s0 = init_state(jnp.array(gt), jnp.array(gt_emb), 1)
    s_fixed, _, _ = step(MergeConfig(), s0)
    np.testing.assert_allclose(np.asarray(s_fixed.ref_emb), gt_emb)

    s_ema, _, info = step(MergeConfig(reid_ema=0.25), s0)
    assert bool(info["present"][0])
    expect = 0.75 * gt_emb[0] + 0.25 * emb[0]
    np.testing.assert_allclose(
        np.asarray(s_ema.ref_emb[0]), expect, atol=1e-6
    )
