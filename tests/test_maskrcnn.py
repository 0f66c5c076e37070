import jax
import jax.numpy as jnp
import numpy as np
import pytest

from premvos_tpu.config import ProposalConfig
from premvos_tpu.models.anchors import pyramid_anchors
from premvos_tpu.models.fpn import FPN_LEVELS
from premvos_tpu.models.maskrcnn import MaskRCNN, multilevel_roi_align, roi_levels

TINY = ProposalConfig(
    backbone_depth=26,
    fpn_channels=64,
    rpn_pre_nms_topk=64,
    rpn_post_nms_topk=16,
    detections_per_frame=8,
)


@pytest.fixture(scope="module")
def model_and_params():
    model = MaskRCNN(cfg=TINY)
    anchors = {
        k: jnp.array(v)
        for k, v in pyramid_anchors(128, 128, TINY.anchor_scales, TINY.anchor_ratios).items()
    }
    img = jnp.zeros((1, 128, 128, 3))
    # jitted init: one compiled program instead of thousands of eager ops
    # (eager init of this fixture measured 82 s on the CPU suite host)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img, anchors)
    return model, params, anchors


def test_anchor_shapes():
    anchors = pyramid_anchors(128, 128, TINY.anchor_scales, TINY.anchor_ratios)
    assert set(anchors) == set(FPN_LEVELS)
    assert anchors["P2"].shape == (32 * 32 * 3, 4)
    assert anchors["P6"].shape == (2 * 2 * 3, 4)
    # anchor at P2 scale 32: first anchor centered at (2, 2)
    a0 = anchors["P2"][1]  # ratio 1.0 is second
    np.testing.assert_allclose(a0, [2 - 16, 2 - 16, 2 + 16, 2 + 16], atol=1e-4)


def test_roi_levels():
    boxes = jnp.array(
        [
            [0, 0, 32, 32],  # small → P2
            [0, 0, 112, 112],  # → P3
            [0, 0, 224, 224],  # canonical → P4
            [0, 0, 448, 448],  # → P5
            [0, 0, 2000, 2000],  # huge → clipped to P5
        ],
        jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(roi_levels(boxes)), [2, 3, 4, 5, 5])


def test_multilevel_roi_align_selects_by_level(rng):
    feats = {
        "P2": jnp.array(rng.standard_normal((32, 32, 8)), jnp.float32),
        "P3": jnp.zeros((16, 16, 8)),
        "P4": jnp.zeros((8, 8, 8)),
        "P5": jnp.zeros((4, 4, 8)),
    }
    small = jnp.array([[8.0, 8.0, 40.0, 40.0]])  # P2 box
    big = jnp.array([[0.0, 0.0, 448.0, 448.0]])  # P5 box (zero features)
    out_small = multilevel_roi_align(feats, small, 7)
    out_big = multilevel_roi_align(feats, big, 7)
    assert float(jnp.abs(out_small).sum()) > 0
    assert float(jnp.abs(out_big).sum()) == 0


def test_multilevel_roi_align_chunked_matches_unchunked(rng):
    # roi_chunk is a pure memory knob (caps the live [N, p·s, W, C] align
    # intermediates in the fine-tune loss — docs/MEMORY_BUDGET.md); results
    # must be bit-identical, including the non-divisible tail.
    feats = {
        f"P{i}": jnp.array(
            rng.standard_normal((64 >> (i - 2), 64 >> (i - 2), 8)),
            jnp.float32,
        )
        for i in range(2, 6)
    }
    n = 21  # not a multiple of the chunk → exercises padding + tail
    sizes = rng.uniform(8.0, 400.0, (n,))
    x1 = rng.uniform(0.0, 50.0, (n,))
    y1 = rng.uniform(0.0, 50.0, (n,))
    boxes = jnp.asarray(
        np.stack([x1, y1, x1 + sizes, y1 + sizes], -1), jnp.float32
    )
    want = multilevel_roi_align(feats, boxes, 7)
    got = multilevel_roi_align(feats, boxes, 7, roi_chunk=8)
    # atol 1e-5: lax.map regroups the align einsums (fp reassociation)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_maskrcnn_forward_shapes(model_and_params):
    model, params, anchors = model_and_params
    img = jnp.array(np.random.default_rng(0).standard_normal((1, 128, 128, 3)), jnp.float32)
    out = jax.jit(model.apply)(params, img, anchors)
    d = TINY.detections_per_frame
    assert out["boxes"].shape == (1, d, 4)
    assert out["scores"].shape == (1, d)
    assert out["valid"].shape == (1, d)
    assert out["mask_logits"].shape == (1, d, 28, 28)
    assert bool(jnp.isfinite(out["boxes"]).all())
    assert bool(jnp.isfinite(out["mask_logits"]).all())
    # padded rows are zeroed
    inv = ~np.asarray(out["valid"][0])
    assert np.asarray(out["scores"][0])[inv].sum() == 0


def test_maskrcnn_batch(model_and_params):
    # Shape-contract only — eval_shape traces without compiling (the batch-2
    # compile alone cost ~53 s of the fast suite; batched NUMERICS are
    # exercised by the pipeline stage tests via stages_batch).
    model, params, anchors = model_and_params
    img = jnp.zeros((2, 128, 128, 3), jnp.float32)
    out = jax.eval_shape(model.apply, params, img, anchors)
    d = TINY.detections_per_frame
    assert out["boxes"].shape == (2, d, 4)
    assert out["scores"].shape == (2, d)
    assert out["mask_logits"].shape == (2, d, 28, 28)
