"""YouTube-VOS-style mid-sequence object introduction."""

import jax.numpy as jnp
import numpy as np

from premvos_tpu.pipeline.runner import run_sequence
from tests.test_pipeline import TINY, make_video, pipeline  # noqa: F401


def test_intro_frames_activate_objects(pipeline):  # noqa: F811
    models, params = pipeline
    frames, gt = make_video(t=4)
    intro = jnp.array([0, 2], jnp.int32)  # object 2 appears at frame 2
    labels = run_sequence(models, params, TINY, frames, gt, 2, intro)
    lab = np.asarray(labels)
    # Frame 0: only object 1 annotated.
    assert (lab[0] != 2).all()
    assert (lab[0, 10:20, 10:20] == 1).all()
    # Frames before the intro never contain object 2.
    assert (lab[1] != 2).all()
    # Intro frame emits object 2's annotation verbatim.
    assert (lab[2, 40:50, 40:50] == 2).all()


def test_intro_merge_frame_unit():
    from premvos_tpu.stages.merge import init_state, merge_frame
    from tests.test_stages import synthetic_frame

    gt, gt_emb, props, emb, flow = synthetic_frame()
    # Start with only object 0 active.
    state = init_state(jnp.array(gt) * jnp.array([1.0, 0.0])[:, None, None],
                       jnp.array(gt_emb), 2)
    state = state._replace(active=jnp.array([True, False]))

    intro_masks = jnp.array(gt)
    new_active = jnp.array([False, True])
    scores = jnp.array([0.9, 0.8, 0.95, 0.0])
    valid = jnp.array([True, True, True, False])
    new_state, labels, info = merge_frame(
        state, jnp.array(props), scores, jnp.array(emb), valid,
        jnp.array(flow), intro=(new_active, intro_masks),
    )
    lab = np.asarray(labels)
    # Introduced object 1 emits its annotation (at its GT location).
    assert (lab[10:14, 10:14] == 2).all()
    # It is active and carries its annotation into the next frame.
    assert bool(new_state.active[1])
    np.testing.assert_allclose(np.asarray(new_state.prev_masks[1]), gt[1])
