"""Identity-swap regression (docs/SELECTION_DIAGNOSIS.md): after one object
fully disappears, its coasting warp prior drifts toward the OTHER object;
with reference-default weights (score floor 0) the stale track grabs any
valid proposal its ghost overlaps — a false-present that can cascade into
a permanent swap. The score floor must prevent it. Reference parity note:
the reference's merge has the same objectness/ReID/warp/overlap structure
with hand-tuned constants (SURVEY.md C5, unverified); this encodes the
failure mode those constants implicitly guard against."""

import jax.numpy as jnp
import numpy as np

from premvos_tpu.config import MergeConfig
from premvos_tpu.stages.merge import init_state, merge_frame


def _drift_flow(h, w, dy, dx):
    """Backward flow that translates warped content by (dy, dx)."""
    f = np.zeros((h, w, 2), np.float32)
    f[..., 0] = dx
    f[..., 1] = dy
    return jnp.asarray(-f)  # backward warp: sample from -(dy,dx)


def _run(cfg):
    """Two objects; B disappears and its prior drifts onto a look-alike
    distractor proposal near A. Returns (B-ever-present, A's last assign,
    last info)."""
    h = w = 16
    gt = np.zeros((2, h, w), np.float32)
    gt[0, 2:6, 2:6] = 1.0      # object A top-left
    gt[1, 10:14, 10:14] = 1.0  # object B bottom-right
    gt_emb = np.eye(2, 8, dtype=np.float32)  # orthogonal unit embeddings
    state = init_state(jnp.array(gt), jnp.array(gt_emb), 2)

    # Proposals every frame: 0 = A itself; 1 = a distractor blob in the
    # middle of the image (valid, modest objectness, embedding matching
    # NEITHER object). B itself has no proposal (fully disappeared).
    props = np.zeros((3, h, w), np.float32)
    props[0, 2:6, 2:6] = 1.0
    props[1, 6:10, 6:10] = 1.0
    emb = np.zeros((3, 8), np.float32)
    emb[0, 0] = 1.0  # proposal 0 looks like A
    emb[1, 4] = 1.0  # distractor: unknown identity
    scores = jnp.array([0.9, 0.4, 0.0])
    valid = jnp.array([True, True, False])

    # B's coasting prior drifts up-left 2 px/frame — after 2-3 frames it
    # sits on the distractor blob.
    flow = _drift_flow(h, w, -2, -2)
    b_present_ever = False
    for _ in range(4):
        state, labels, info = merge_frame(
            state, jnp.array(props), scores, jnp.array(emb), valid, flow, cfg
        )
        if bool(info["present"][1]):
            b_present_ever = True
    return b_present_ever, int(info["assign"][0]), info


def test_floor_blocks_ghost_steal():
    """With the score floor, the disappeared track must never claim the
    drifting look-alike proposal, and A must keep its own proposal."""
    # The tuned anti-swap mechanism is floor + staleness decay
    # TOGETHER: the decay collapses the stale ghost's warp term (0.6^3
    # after 3 coasting frames) so the steal score (~1.1 = objectness +
    # decayed warp) falls below the floor, while a genuine match scores
    # ~2.9. Floor alone is beatable by a fully-drifted ghost riding a
    # high-objectness proposal (verified: it steals at t=3 without decay).
    cfg = MergeConfig(new_object_score_floor=1.5, warp_decay=0.6,
                      reid_sigma=0.5)
    b_present, a_assign, info = _run(cfg)
    assert not b_present
    assert bool(info["present"][0])
    assert a_assign == 0


def test_defaults_ghost_steals_documented():
    """The failure mode the floor fixes is real: at floor 0 the stale
    track's drifting ghost claims the distractor proposal (objectness +
    warp-IoU leakage > 0) — a false present for a GT-absent object. If
    this ever stops reproducing, docs/SELECTION_DIAGNOSIS.md needs
    revisiting."""
    cfg = MergeConfig(new_object_score_floor=0.0, reid_sigma=0.5)
    b_present, _, _ = _run(cfg)
    assert b_present
