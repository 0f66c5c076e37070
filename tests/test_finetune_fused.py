"""On-device lucid augmentation + fused per-video fine-tune (SURVEY §3.2).

The host cv2 generator (data/lucid.py) is the distribution oracle: the
device generator must match its parameter ranges statistically (exact RNG
parity is impossible and not the point — both sample the same LDD recipe).
The fused trainers must run on the virtual CPU mesh and actually learn.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from premvos_tpu.config import FinetuneConfig, RefineConfig
from premvos_tpu.finetune.lucid_device import (
    lucid_batch_device,
    lucid_frame,
    perturb_mask_device,
    smooth_field,
)


def test_chunk_lengths_covers_curve_without_retrace():
    # One build must serve a whole steps-vs-J&F curve: full chunk + every
    # nonzero remainder, nothing else (ADVICE r4: no per-candidate retrace).
    from premvos_tpu.finetune.fused import chunk_lengths

    assert chunk_lengths([500], 25) == {25}
    assert chunk_lengths([50, 150, 300, 500], 25) == {25}
    assert chunk_lengths([60, 150], 25) == {25, 10}
    assert chunk_lengths([10], 25) == {10}  # sub-chunk run
    assert chunk_lengths([], 25) == {25}  # degenerate: the chunk itself


def _fixture(h=96, w=160, k_slots=4):
    r = np.random.default_rng(7)
    img = r.integers(0, 255, (h, w, 3)).astype(np.float32)
    masks = np.zeros((k_slots, h, w), np.float32)
    masks[0, 20:52, 30:78] = 1.0
    masks[1, 48:80, 90:132] = 1.0
    valid = np.array([True, True, False, False])
    bg = r.integers(0, 255, (h, w, 3)).astype(np.float32)
    return jnp.asarray(img), jnp.asarray(masks), jnp.asarray(valid), jnp.asarray(bg)


def test_lucid_frame_shapes_and_ranges():
    img, masks, valid, bg = _fixture()
    canvas, out = jax.jit(
        lambda k: lucid_frame(k, img, masks, valid, bg, patch=64)
    )(jax.random.PRNGKey(0))
    assert canvas.shape == img.shape
    assert out.shape == masks.shape
    assert float(canvas.min()) >= 0.0 and float(canvas.max()) <= 255.0
    # invalid slots stay empty
    assert float(out[2:].sum()) == 0.0


def test_lucid_frame_area_preservation():
    """Scale range 0.9–1.1 bounds the warped mask area to ~[0.8, 1.25]× of
    the original (elastic/occlusion add slack)."""
    img, masks, valid, bg = _fixture()
    f = jax.jit(lambda k: lucid_frame(k, img, masks, valid, bg, patch=64))
    a0 = np.asarray(masks.sum((1, 2)))[:2]
    ratios = []
    for s in range(12):
        _, out = f(jax.random.PRNGKey(s))
        a = np.asarray(out.sum((1, 2)))[:2]
        ratios.extend((a / a0).tolist())
    ratios = np.asarray(ratios)
    # objects can be partially shifted out of frame or occluded, but the
    # bulk must land in the geometric-scale envelope
    assert np.median(ratios) > 0.7 and np.median(ratios) < 1.35
    assert ratios.max() < 1.6


def test_lucid_masks_disjoint_and_composited():
    """Post-composite masks are disjoint (later slots occlude earlier),
    matching data/lucid.py's overwrite order."""
    img, masks, valid, bg = _fixture()
    # force overlap: identical masks in slots 0 and 1
    masks = masks.at[1].set(masks[0])
    _, out = jax.jit(
        lambda k: lucid_frame(k, img, masks, valid, bg, patch=64)
    )(jax.random.PRNGKey(3))
    overlap = float((out[0] * out[1]).sum())
    assert overlap == 0.0


def test_lucid_distribution_matches_host_oracle():
    """Device vs host generator: mean mask-area ratio within 15 % of each
    other over 16 draws (same recipe, different RNGs)."""
    from premvos_tpu.data.lucid import lucid_batch

    img, masks, valid, bg = _fixture()
    lab = np.zeros(img.shape[:2], np.int32)
    lab[np.asarray(masks[0]) > 0.5] = 1
    lab[np.asarray(masks[1]) > 0.5] = 2
    host_imgs, host_labs = lucid_batch(
        np.asarray(img, np.uint8), lab, np.random.default_rng(0), 16,
        background=np.asarray(bg, np.uint8),
    )
    a0 = (lab > 0).sum()
    host_ratio = float((host_labs > 0).sum()) / (16 * a0)

    canvases, outs = jax.jit(
        lambda k: lucid_batch_device(k, img, masks, valid, bg, 16, patch=64)
    )(jax.random.PRNGKey(0))
    dev_ratio = float((np.asarray(outs) > 0.5).sum()) / (16 * a0)
    assert abs(dev_ratio - host_ratio) / host_ratio < 0.15
    # photometric keeps canvases in range and actually changes pixels
    assert float(jnp.abs(canvases[0] - canvases[1]).mean()) > 1.0


def test_smooth_field_is_smooth():
    """Elastic fields must stay within the recipe's amplitude and be
    spatially smooth (gradient ≪ 1 px/px — the premise of both the host
    1/8-res generation and the block-warp exactness envelope)."""
    f = jax.jit(lambda k: smooth_field(k, 128, 128))(jax.random.PRNGKey(0))
    assert f.shape == (128, 128, 2)
    assert float(jnp.abs(f).max()) <= 8.0 + 1e-5
    g = jnp.abs(jnp.diff(f, axis=0)).max()
    assert float(g) < 1.0


def test_perturb_mask_device():
    m = jnp.zeros((64, 64)).at[20:40, 20:40].set(1.0)
    areas = set()
    for s in range(8):
        pm = jax.jit(perturb_mask_device)(jax.random.PRNGKey(s), m)
        areas.add(float(pm.sum()))
        assert 0.5 * 400 < float(pm.sum()) < 2.0 * 400
    assert len(areas) > 2  # the perturbation actually varies


@pytest.fixture(scope="module")
def small_world():
    r = np.random.default_rng(0)
    frame0 = r.integers(0, 255, (96, 160, 3)).astype(np.uint8)
    lab0 = np.zeros((96, 160), np.int32)
    lab0[20:50, 30:70] = 1
    lab0[50:80, 90:130] = 2
    return frame0, lab0


def test_finetune_refine_fused_runs_and_learns(small_world):
    from premvos_tpu.finetune.fused import finetune_refine_fused
    from premvos_tpu.models.deeplab import DeepLabV3Plus
    from premvos_tpu.parallel.mesh import make_mesh

    frame0, lab0 = small_world
    ref = RefineConfig(crop_size=65, backbone_depth=26, norm="group_norm")
    ft = FinetuneConfig(steps=7, chunk=3, batch_size=4, aug_patch=64)
    model = DeepLabV3Plus(cfg=ref)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 65, 65, 4)))
    mesh = make_mesh(2)
    p2, loss = finetune_refine_fused(
        model, params, frame0, lab0, mesh, ref, ft, max_objects=4
    )
    assert np.isfinite(loss)
    delta = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(params))
    )
    assert delta > 0.0


@pytest.mark.slow  # grad(detection loss)+lucid aug in one scanned program:
#                    ~25 min XLA:CPU compile on the 1-vCPU test host
def test_finetune_proposals_fused_runs(small_world):
    import dataclasses as dc

    from premvos_tpu.config import ProposalConfig
    from premvos_tpu.finetune.fused import finetune_proposals_fused
    from premvos_tpu.models.maskrcnn import MaskRCNN
    from premvos_tpu.parallel.mesh import make_mesh

    frame0, lab0 = small_world
    pcfg = ProposalConfig(
        backbone_depth=26, norm="group_norm", rpn_pre_nms_topk=64,
        rpn_post_nms_topk=32, detections_per_frame=8,
    )
    # proposal_scale 0.5 → 48×80 rounds to 64×96 backbone grid
    ft = FinetuneConfig(
        steps=4, chunk=2, batch_size=2, aug_patch=64, proposal_scale=0.5
    )
    model = MaskRCNN(cfg=pcfg)
    from premvos_tpu.models.anchors import pyramid_anchors

    h, w = 64, 96
    anchors = {
        k: jnp.asarray(v)
        for k, v in pyramid_anchors(
            h, w, pcfg.anchor_scales, pcfg.anchor_ratios
        ).items()
    }
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)), anchors
    )
    mesh = make_mesh(2)
    p2, loss = finetune_proposals_fused(
        model, params, pcfg, frame0, lab0, mesh, ft, max_objects=4,
        image_hw=(h, w),
    )
    assert np.isfinite(loss)
