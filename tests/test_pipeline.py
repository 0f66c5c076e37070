"""End-to-end pipeline smoke tests on a tiny config (random weights).

With random weights the tracker can't be *accurate*; these tests pin the
contract: shapes, dtypes, finiteness, frame-0 = GT, jit-once, and the
sharded multi-sequence path on the 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from premvos_tpu.config import (
    FlowConfig,
    PipelineConfig,
    PremvosConfig,
    ProposalConfig,
    RefineConfig,
    ReIDConfig,
)
from premvos_tpu.parallel.mesh import make_mesh, run_sequences_sharded
from premvos_tpu.pipeline.runner import (
    boxes_from_masks,
    build_models,
    init_params,
    run_sequence,
)

TINY = PremvosConfig(
    proposal=ProposalConfig(
        backbone_depth=26,
        fpn_channels=32,
        rpn_pre_nms_topk=32,
        rpn_post_nms_topk=8,
        detections_per_frame=4,
    ),
    refine=RefineConfig(crop_size=33, backbone_depth=26),
    flow=FlowConfig(
        variant="flownetc", max_displacement=4, infer_height=64, infer_width=64
    ),
    reid=ReIDConfig(backbone_depth=26, embedding_dim=8, crop_size=32),
    pipeline=PipelineConfig(
        image_height=64, image_width=64, max_objects=2, max_proposals=4,
        dtype="float32",
    ),
)


def make_video(t=3, h=64, w=64):
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (t, h, w, 3)).astype(np.uint8)
    gt = np.zeros((2, h, w), np.float32)
    gt[0, 10:20, 10:20] = 1.0
    gt[1, 40:50, 40:50] = 1.0
    return jnp.array(frames), jnp.array(gt)


@pytest.fixture(scope="module")
def pipeline():
    models = build_models(TINY)
    params = init_params(models, TINY, jax.random.PRNGKey(0))
    return models, params


def test_boxes_from_masks():
    m = np.zeros((2, 16, 16), np.float32)
    m[0, 3:7, 5:9] = 1.0
    boxes = np.asarray(boxes_from_masks(jnp.array(m)))
    np.testing.assert_array_equal(boxes[0], [5, 3, 9, 7])
    np.testing.assert_array_equal(boxes[1], [0, 0, 0, 0])  # empty → degenerate


def test_run_sequence_contract(pipeline):
    models, params = pipeline
    frames, gt = make_video()
    labels = run_sequence(models, params, TINY, frames, gt, 2)
    assert labels.shape == (3, 64, 64)
    assert labels.dtype == jnp.int32
    lab = np.asarray(labels)
    assert set(np.unique(lab)) <= {0, 1, 2}
    # frame 0 is exactly the GT arrangement
    assert (lab[0, 10:20, 10:20] == 1).all()
    assert (lab[0, 40:50, 40:50] == 2).all()
    assert lab[0, 0, 0] == 0


def test_run_sequence_single_object(pipeline):
    models, params = pipeline
    frames, gt = make_video()
    labels = run_sequence(models, params, TINY, frames, gt, 1)
    lab = np.asarray(labels)
    assert (lab != 2).all()  # padded object slot never emits labels


@pytest.mark.slow
def test_chunked_scan_matches_sequential(pipeline):
    """The two-level scan (stages 1–4 batched over scan_chunk frames, merge
    scanned inside) must reproduce the fully sequential path — batching is a
    pure restructuring; only the merge carries state. T=6 with chunk=4
    exercises the tail-padding (pad=2, t=−1 sentinel)."""
    import dataclasses

    models, params = pipeline
    frames, gt = make_video(t=6)
    # warp_stride=1: with random weights the coarse warp makes borderline
    # score flips chaotic frame-to-frame; the exact warp keeps this a pure
    # restructuring-parity check.
    exact = dataclasses.replace(TINY.merge, warp_stride=1)
    cfg4 = dataclasses.replace(
        TINY, merge=exact,
        pipeline=dataclasses.replace(TINY.pipeline, scan_chunk=4),
    )
    cfg1 = dataclasses.replace(
        TINY, merge=exact,
        pipeline=dataclasses.replace(TINY.pipeline, scan_chunk=1),
    )
    l1 = np.asarray(run_sequence(build_models(cfg1), params, cfg1, frames, gt, 2))
    l4 = np.asarray(run_sequence(build_models(cfg4), params, cfg4, frames, gt, 2))
    assert l4.shape == (6, 64, 64)
    # fp32 tiny config: identical up to conv-reduction reassociation; in
    # practice exact on CPU, allow a sliver of borderline-pixel flips.
    assert (l1 == l4).mean() > 0.995


@pytest.mark.slow
def test_sharded_sequences_on_cpu_mesh(pipeline):
    models, params = pipeline
    mesh = make_mesh(8)
    frames, gt = make_video()
    b = 8
    frames_b = jnp.broadcast_to(frames[None], (b, *frames.shape))
    gt_b = jnp.broadcast_to(gt[None], (b, *gt.shape))
    n_b = jnp.full((b,), 2, jnp.int32)
    labels = run_sequences_sharded(models, params, TINY, frames_b, gt_b, n_b, mesh)
    assert labels.shape == (b, 3, 64, 64)
    # all replicas agree (identical inputs)
    lab = np.asarray(labels)
    for i in range(1, b):
        np.testing.assert_array_equal(lab[i], lab[0])
