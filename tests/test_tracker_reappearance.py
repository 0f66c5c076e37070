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
