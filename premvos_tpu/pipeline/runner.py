"""The fused VOS pipeline: proposal → refine → flow → ReID → merge, one scan.

The reference runs five processes that pass JSON/.flo/PNG files through the
filesystem (SURVEY.md §1 L3/L5); every `║` in its call stacks (§3) is a
serialize/deserialize boundary. Here the whole pipeline is ONE jitted
`lax.scan` over frames: the carry is the tracking state (previous masks),
per-frame proposals/refined masks/flow/embeddings live only inside the scan
body, and all parameters stay resident in HBM. Per-sequence parallelism
(DAVIS sequences are independent) is sharded across chips by
`premvos_tpu.parallel.mesh`.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from premvos_tpu.config import PremvosConfig
from premvos_tpu.data.preprocess import normalize, to_unit
from premvos_tpu.models.anchors import pyramid_anchors
from premvos_tpu.models.deeplab import DeepLabV3Plus
from premvos_tpu.models.flownet import FlowNet2
from premvos_tpu.models.maskrcnn import MaskRCNN
from premvos_tpu.models.reid import ReIDNet
from premvos_tpu.stages.merge import init_state, merge_frame
from premvos_tpu.stages.refine import make_refine_crops, refined_fullres, run_refine
from premvos_tpu.stages.reid import run_reid
from premvos_tpu.stages.proposals import run_proposals  # noqa: F401 (re-export)


class Models(NamedTuple):
    maskrcnn: Any
    refine: Any
    flow: Any
    reid: Any


def build_models(cfg: PremvosConfig, dtype=None) -> Models:
    dtype = dtype or jnp.dtype(cfg.pipeline.dtype)
    return Models(
        maskrcnn=MaskRCNN(cfg=cfg.proposal, dtype=dtype),
        refine=DeepLabV3Plus(cfg=cfg.refine, dtype=dtype),
        flow=FlowNet2(
            variant=cfg.flow.variant,
            max_displacement=cfg.flow.max_displacement,
            corr_stride=cfg.flow.corr_stride,
            div_flow=cfg.flow.div_flow,
            dtype=dtype,
            warp_impl=cfg.flow.warp_impl,
        ),
        reid=ReIDNet(cfg=cfg.reid, dtype=dtype),
    )


def init_params(models: Models, cfg: PremvosConfig, rng) -> dict:
    """Random-init parameter bundle (pretrained weights load via
    utils.checkpoint / io_compat converters when available).

    Every init is jitted: eager flax init issues thousands of small device
    ops, which measured ~10 min through this platform's TPU relay; one
    compiled program per net brings it to seconds.
    """
    p = cfg.pipeline
    h, w = p.image_height, p.image_width
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    anchors = get_anchors(cfg)
    img = jnp.zeros((1, h, w, 3), jnp.float32)
    crops = jnp.zeros((1, cfg.refine.crop_size, cfg.refine.crop_size, 4))
    pair = jnp.zeros((1, cfg.flow.infer_height, cfg.flow.infer_width, 3))
    reid_crops = jnp.zeros((1, cfg.reid.crop_size, cfg.reid.crop_size, 3))
    return {
        "maskrcnn": jax.jit(models.maskrcnn.init)(k1, img, anchors),
        "refine": jax.jit(models.refine.init)(k2, crops),
        "flow": jax.jit(models.flow.init)(k3, pair, pair),
        "reid": jax.jit(models.reid.init)(k4, reid_crops),
    }


def get_anchors(cfg: PremvosConfig) -> dict:
    p = cfg.pipeline
    return {
        k: jnp.asarray(v)
        for k, v in pyramid_anchors(
            p.image_height,
            p.image_width,
            cfg.proposal.anchor_scales,
            cfg.proposal.anchor_ratios,
        ).items()
    }


def boxes_from_masks(masks: jnp.ndarray) -> jnp.ndarray:
    """[K, H, W] masks → [K, 4] tight xyxy boxes (degenerate for empty)."""
    k, h, w = masks.shape
    on = masks > 0.5
    cols = jnp.any(on, axis=1)  # [K, W]
    rows = jnp.any(on, axis=2)  # [K, H]
    xi = jnp.arange(w)
    yi = jnp.arange(h)
    big = jnp.int32(1 << 20)
    x1 = jnp.min(jnp.where(cols, xi, big), axis=1)
    x2 = jnp.max(jnp.where(cols, xi, -1), axis=1) + 1
    y1 = jnp.min(jnp.where(rows, yi, big), axis=1)
    y2 = jnp.max(jnp.where(rows, yi, -1), axis=1) + 1
    empty = ~jnp.any(cols, axis=1)
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1).astype(jnp.float32)
    return jnp.where(empty[:, None], 0.0, boxes)


def frame_step(
    models, params, anchors, cfg, state, frame, prev_frame, intro=None
):
    """All five stages for one frame; pure function for lax.scan.

    frame/prev_frame: [H, W, 3] float32 in [0, 1]. `intro` optionally
    introduces objects annotated at this frame (YT-VOS protocol); see
    stages.merge.merge_frame.
    """
    p = cfg.pipeline
    h, w = p.image_height, p.image_width

    # Stage 1 — proposals (batch of one frame).
    img_n = normalize(frame)[None]
    det = models.maskrcnn.apply(params["maskrcnn"], img_n, anchors)
    boxes = det["boxes"][0]
    scores = det["scores"][0]
    valid = det["valid"][0]
    mask_logits = det["mask_logits"][0]

    # Stage 2 — refinement on 385² crops. Full-res soft masks are stored in
    # the compute dtype (bf16): [N, H, W] is the merge stage's bandwidth
    # driver, and the paste itself stays fp32 inside refined_fullres.
    ref_logits, crop_boxes = run_refine(
        models.refine, params["refine"], img_n[0], boxes, mask_logits, valid,
        cfg.refine,
    )
    from premvos_tpu.stages.refine import interp_precision

    prop_masks = refined_fullres(
        ref_logits, crop_boxes, valid, h, w,
        interp_precision(cfg.refine.interp_precision),
    ).astype(jnp.dtype(p.dtype))

    # Stage 3 — backward flow (current → previous) at the flow net's grid.
    fh, fw = cfg.flow.infer_height, cfg.flow.infer_width
    cur = jax.image.resize(frame[None], (1, fh, fw, 3), "bilinear")
    prev = jax.image.resize(prev_frame[None], (1, fh, fw, 3), "bilinear")
    flow = models.flow.apply(params["flow"], cur, prev)[0]
    flow = jax.image.resize(flow, (h, w, 2), "bilinear")
    flow = flow * jnp.array([w / fw, h / fh], flow.dtype)

    # Stage 4 — ReID embeddings of proposal crops.
    emb = run_reid(
        models.reid, params["reid"], img_n[0], boxes, valid,
        cfg.reid.crop_size,
    )

    # Stage 5 — merge & track.
    new_state, labels, info = merge_frame(
        state, prop_masks, scores, emb, valid, flow, cfg.merge, intro=intro
    )
    return new_state, labels, info


def stages_batch(models, params, anchors, cfg, frames_chunk, prev_chunk):
    """Stages 1–4 for a chunk of C frames, batched over the frame axis.

    These stages have no frame-to-frame dependency (the reference runs each
    as its own whole-dataset process — SURVEY.md §3.1–§3.5); only the merge
    carries state. Batching them multiplies arithmetic intensity: the
    backbone/flow nets run at batch C instead of 1, and the refinement /
    ReID nets see C·N crops per dispatch.

    frames_chunk / prev_chunk: [C, H, W, 3] float32 in [0, 1].
    Returns (prop_masks [C, N, H, W], scores [C, N], emb [C, N, E],
             valid [C, N], flow [C, H, W, 2]).
    """
    p = cfg.pipeline
    h, w = p.image_height, p.image_width
    c = frames_chunk.shape[0]

    # Stage 1 — proposals, batch C.
    imgs = normalize(frames_chunk)
    det = models.maskrcnn.apply(params["maskrcnn"], imgs, anchors)
    boxes, scores = det["boxes"], det["scores"]
    valid, mask_logits = det["valid"], det["mask_logits"]
    n = boxes.shape[1]

    # Stage 2 — refinement on all C·N crops in one dispatch.
    from premvos_tpu.stages.refine import interp_precision

    prec = interp_precision(cfg.refine.interp_precision)
    crops, crop_boxes = jax.vmap(
        lambda im, b, ml: make_refine_crops(
            im, b, ml, cfg.refine.crop_size, cfg.refine.box_margin, prec
        )
    )(imgs, boxes, mask_logits)
    s = cfg.refine.crop_size
    ref_logits = models.refine.apply(
        params["refine"], crops.reshape(c * n, s, s, crops.shape[-1])
    ).reshape(c, n, s, s)
    ref_logits = ref_logits * valid[..., None, None].astype(ref_logits.dtype)
    prop_masks = jax.vmap(
        lambda rl, cb, v: refined_fullres(rl, cb, v, h, w, prec)
    )(ref_logits, crop_boxes, valid).astype(jnp.dtype(p.dtype))

    # Stage 3 — backward flow for all C pairs at once.
    fh, fw = cfg.flow.infer_height, cfg.flow.infer_width
    cur = jax.image.resize(frames_chunk, (c, fh, fw, 3), "bilinear")
    prev = jax.image.resize(prev_chunk, (c, fh, fw, 3), "bilinear")
    flow = models.flow.apply(params["flow"], cur, prev)
    flow = jax.image.resize(flow, (c, h, w, 2), "bilinear")
    flow = flow * jnp.array([w / fw, h / fh], flow.dtype)

    # Stage 4 — ReID embeddings of all C·N crops.
    emb = jax.vmap(
        lambda im, b, v: run_reid(
            models.reid, params["reid"], im, b, v, cfg.reid.crop_size
        )
    )(imgs, boxes, valid)

    return prop_masks, scores, emb, valid, flow


@partial(jax.jit, static_argnames=("models", "cfg"))
def precompute_sequence(
    models: Models,
    params: dict,
    cfg: PremvosConfig,
    frames: jnp.ndarray,
    gt_masks: jnp.ndarray,
    num_objects,
    intro_frames: jnp.ndarray | None = None,
):
    """Stages 1–4 outputs for a whole sequence, plus GT reference embeddings.

    Nothing here depends on MergeConfig, so the merge-weight tuning harness
    (scripts/tune_merge.py) computes this once per sequence and replays only
    the cheap merge scan per candidate. Returns a dict of [T−1, ...] arrays
    (steps 1..T−1) + gt_emb/gt_valid.
    """
    anchors = get_anchors(cfg)
    frames = to_unit(frames)
    k = gt_masks.shape[0]
    gt_valid = jnp.arange(k) < num_objects
    if intro_frames is None:
        intro_frames = jnp.zeros((k,), jnp.int32)

    gt_boxes = boxes_from_masks(gt_masks)
    intro_imgs = normalize(frames[intro_frames])
    gt_emb = jax.vmap(
        lambda im, b, v: run_reid(
            models.reid, params["reid"], im, b[None], v[None],
            cfg.reid.crop_size,
        )[0]
    )(intro_imgs, gt_boxes, gt_valid)

    steps = frames.shape[0] - 1
    chunk = max(1, min(int(cfg.pipeline.scan_chunk), max(steps, 1)))
    pad = (-steps) % chunk
    cur = jnp.concatenate([frames[1:], jnp.repeat(frames[-1:], pad, axis=0)])
    prev = jnp.concatenate([frames[:-1], jnp.repeat(frames[-1:], pad, axis=0)])
    n_chunks = (steps + pad) // chunk
    h, w = frames.shape[1], frames.shape[2]

    def chunk_body(_, xs):
        cf, cp = xs
        return None, stages_batch(models, params, anchors, cfg, cf, cp)

    _, outs = jax.lax.scan(
        chunk_body,
        None,
        (
            cur.reshape(n_chunks, chunk, h, w, 3),
            prev.reshape(n_chunks, chunk, h, w, 3),
        ),
    )
    pm, sc, em, va, fl = jax.tree.map(
        lambda x: x.reshape(-1, *x.shape[2:])[:steps], outs
    )
    return {
        "prop_masks": pm, "scores": sc, "emb": em, "valid": va, "flow": fl,
        "gt_emb": gt_emb, "gt_valid": gt_valid,
    }


@partial(jax.jit, static_argnames=("warp_stride", "warp_impl"))
def merge_labels_from_precomputed(
    pre: dict,
    gt_masks: jnp.ndarray,
    num_objects,
    weights: jnp.ndarray,
    warp_stride: int = 1,
    warp_impl: str = "block",
):
    """Replay ONLY the merge scan over precomputed stage outputs.

    weights: [6], [8] or [9] array — (w_objectness, w_reid, w_warp,
    w_overlap, reid_sigma, new_object_score_floor[, warp_decay, reid_ema[,
    reid_reacquire]]). Traced, so a single compilation serves every tuning
    candidate. Returns labels [T, H, W] int32 (frame 0 = the annotation, as
    in run_sequence; DAVIS-protocol intro at frame 0).
    """
    from premvos_tpu.config import MergeConfig

    cfg_m = MergeConfig(
        w_objectness=weights[0],
        w_reid=weights[1],
        w_warp=weights[2],
        w_overlap=weights[3],
        reid_sigma=weights[4],
        new_object_score_floor=weights[5],
        warp_decay=weights[6] if weights.shape[0] > 6 else 1.0,
        reid_ema=weights[7] if weights.shape[0] > 7 else 0.0,
        reid_reacquire=weights[8] if weights.shape[0] > 8 else 2.0,
        warp_stride=warp_stride,
        warp_impl=warp_impl,
    )
    state = init_state(gt_masks, pre["gt_emb"], num_objects)

    def body(st, ys):
        pm, sc, em, va, fl = ys
        st, labels, _ = merge_frame(st, pm, sc, em, va, fl, cfg_m)
        return st, labels

    _, labels = jax.lax.scan(
        body,
        state,
        (pre["prop_masks"], pre["scores"], pre["emb"], pre["valid"], pre["flow"]),
    )
    k = gt_masks.shape[0]
    ids = jnp.arange(1, k + 1, dtype=jnp.int32)[:, None, None]
    gt_valid = pre["gt_valid"]
    lab0 = jnp.max(
        jnp.where(jnp.logical_and(gt_masks > 0.5, gt_valid[:, None, None]), ids, 0),
        axis=0,
    )
    return jnp.concatenate([lab0[None], labels], axis=0)


@partial(jax.jit, static_argnames=("models", "cfg"))
def run_sequence(
    models: Models,
    params: dict,
    cfg: PremvosConfig,
    frames: jnp.ndarray,
    gt_masks: jnp.ndarray,
    num_objects,
    intro_frames: jnp.ndarray | None = None,
):
    """Track a whole sequence in one jitted program.

    Args:
      frames: [T, H, W, 3] raw RGB (uint8 or [0,1]); H, W = pipeline canvas.
      gt_masks: [K, H, W] per-object annotation masks (padded to
        max_objects) — each object's mask at ITS annotated frame.
      num_objects: scalar — number of real objects.
      intro_frames: optional [K] int32 — the frame index where each object
        is annotated/introduced (YouTube-VOS). None ⇒ all at frame 0
        (DAVIS semi-supervised).

    Returns labels [T, H, W] int32 (each object's annotated frame emits its
    annotation verbatim).
    """
    anchors = get_anchors(cfg)
    frames = to_unit(frames)
    k = gt_masks.shape[0]
    gt_valid = jnp.arange(k) < num_objects
    if intro_frames is None:
        intro_frames = jnp.zeros((k,), jnp.int32)

    # Reference embeddings: each object's crop from its own intro frame.
    gt_boxes = boxes_from_masks(gt_masks)
    intro_imgs = normalize(frames[intro_frames])  # [K, H, W, 3]
    gt_emb = jax.vmap(
        lambda im, b, v: run_reid(
            models.reid, params["reid"], im, b[None], v[None],
            cfg.reid.crop_size,
        )[0]
    )(intro_imgs, gt_boxes, gt_valid)

    state = init_state(
        gt_masks * (intro_frames == 0)[:, None, None], gt_emb, num_objects
    )
    state = state._replace(
        active=jnp.logical_and(state.active, intro_frames == 0)
    )

    # Two-level scan: stages 1–4 batched over scan_chunk frames (no frame
    # dependency), merge scanned frame-by-frame inside each chunk. Steps are
    # padded to a chunk multiple by repeating the last frame with t = −1
    # (matches no intro frame; padded labels are dropped below, and state
    # updates past the last real frame are never read).
    t_total = frames.shape[0]
    steps = t_total - 1
    chunk = max(1, min(int(cfg.pipeline.scan_chunk), max(steps, 1)))
    pad = (-steps) % chunk
    cur = jnp.concatenate([frames[1:], jnp.repeat(frames[-1:], pad, axis=0)])
    prev = jnp.concatenate(
        [frames[:-1], jnp.repeat(frames[-1:], pad, axis=0)]
    )
    ts = jnp.concatenate(
        [
            jnp.arange(1, t_total, dtype=jnp.int32),
            jnp.full((pad,), -1, jnp.int32),
        ]
    )
    n_chunks = (steps + pad) // chunk
    h, w = frames.shape[1], frames.shape[2]
    cur = cur.reshape(n_chunks, chunk, h, w, 3)
    prev = prev.reshape(n_chunks, chunk, h, w, 3)
    ts = ts.reshape(n_chunks, chunk)

    def merge_body(st, ys):
        pm, sc, em, va, fl, t = ys
        new_active = jnp.logical_and(intro_frames == t, gt_valid)
        st, labels, _ = merge_frame(
            st, pm, sc, em, va, fl, cfg.merge, intro=(new_active, gt_masks)
        )
        return st, labels

    def chunk_body(st, xs):
        cf, cp, cts = xs
        pm, sc, em, va, fl = stages_batch(models, params, anchors, cfg, cf, cp)
        st, labels = jax.lax.scan(merge_body, st, (pm, sc, em, va, fl, cts))
        return st, labels

    _, labels = jax.lax.scan(chunk_body, state, (cur, prev, ts))
    labels = labels.reshape(n_chunks * chunk, h, w)[:steps]

    # Frame 0 label map from objects introduced at frame 0.
    ids = jnp.arange(1, k + 1, dtype=jnp.int32)[:, None, None]
    at0 = jnp.logical_and(gt_valid, intro_frames == 0)
    gt0 = jnp.where(
        jnp.logical_and(gt_masks > 0.5, at0[:, None, None]), ids, 0
    )
    lab0 = jnp.max(gt0, axis=0)
    return jnp.concatenate([lab0[None], labels], axis=0)
