"""Staged mode: the reference's five-stage file-passing pipeline, 1:1.

The fused runner (pipeline/runner.py) is the production path; this module
reproduces the reference's *public stage APIs* (SURVEY.md L3/L5) — each stage
a separate command reading/writing the reference's on-disk contracts — for
debugging, golden-parity dumps, and drop-in workflows:

  proposals : frames → per-frame proposals JSON (bbox, score, RLE mask)
  refine    : proposals JSON → rewritten JSON with refined RLE masks
  flow      : frame pairs → Middlebury .flo files (%05d.flo = flow of
              frame t sampled back into frame t−1; backward convention,
              see stages/flow.py)
  reid      : proposals JSON → JSON with "ReID" embedding appended
  merge     : JSONs + .flo + first-frame GT → DAVIS-palette PNGs

  python -m premvos_tpu.pipeline.run_stages <stage> --davis_root D \
      --seq NAME --work WORKDIR [--config cfg.json]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from premvos_tpu.config import PremvosConfig, load_config
from premvos_tpu.data.davis import DavisDataset, crop_result, save_results
from premvos_tpu.data.preprocess import normalize, to_unit
from premvos_tpu.io_compat.flo import read_flo, write_flo
from premvos_tpu.io_compat.proposals_json import (
    FrameProposals,
    load_proposals,
    save_proposals,
)
from premvos_tpu.utils.logging import get_logger


def _setup(args):
    cfg = load_config(args.config) if args.config else PremvosConfig()
    from premvos_tpu.pipeline.runner import build_models, init_params

    models = build_models(cfg)
    params = init_params(models, cfg, jax.random.PRNGKey(0))
    if args.checkpoint:
        from premvos_tpu.utils.checkpoint import load_params

        params = load_params(args.checkpoint, like=params)
    ds = DavisDataset(args.davis_root)
    p = cfg.pipeline
    seq = ds.load_sequence(
        args.seq, p.image_height, p.image_width, p.max_objects, args.max_frames
    )
    return cfg, models, params, ds, seq


def stage_proposals(args):
    """Stage 1 → WORK/proposals/<seq>/frame_%05d.json."""
    cfg, models, params, ds, seq = _setup(args)
    from premvos_tpu.pipeline.runner import get_anchors
    from premvos_tpu.stages.proposals import proposal_masks_fullres, run_proposals

    out = Path(args.work) / "proposals" / args.seq
    out.mkdir(parents=True, exist_ok=True)
    anchors = get_anchors(cfg)
    h, w = cfg.pipeline.image_height, cfg.pipeline.image_width

    paste = jax.jit(
        lambda b, ml, v: proposal_masks_fullres(b, ml, v, h, w) > 0.5
    )
    for t, frame in enumerate(seq["frames"]):
        det = run_proposals(
            models.maskrcnn, params["maskrcnn"], jnp.asarray(frame)[None], anchors
        )
        masks = paste(det["boxes"][0], det["mask_logits"][0], det["valid"][0])
        props = FrameProposals(
            boxes=np.asarray(det["boxes"][0]),
            scores=np.asarray(det["scores"][0]),
            masks=np.asarray(masks).astype(np.uint8),
            valid=np.asarray(det["valid"][0]),
        )
        save_proposals(out / f"frame_{t:05d}.json", props)
    get_logger().info("proposals: wrote %d frames to %s", len(seq["frames"]), out)


def stage_refine(args):
    """Stage 2: rewrite proposals JSON with refined masks."""
    cfg, models, params, ds, seq = _setup(args)
    from premvos_tpu.ops.roi_align import crop_and_resize
    from premvos_tpu.stages.refine import expand_boxes, refined_fullres

    props_dir = Path(args.work) / "proposals" / args.seq
    h, w = cfg.pipeline.image_height, cfg.pipeline.image_width
    s = cfg.refine.crop_size
    n = cfg.pipeline.max_proposals

    @jax.jit
    def refine_one(frame, boxes, masks, valid):
        img = normalize(to_unit(frame))
        crop_boxes = expand_boxes(boxes, cfg.refine.box_margin, h, w)
        nrm = jnp.stack(
            [crop_boxes[:, 1] / (h - 1), crop_boxes[:, 0] / (w - 1),
             crop_boxes[:, 3] / (h - 1), crop_boxes[:, 2] / (w - 1)], -1)
        rgb = crop_and_resize(img, nrm, s)
        mask_ch = jax.vmap(
            lambda m, b: crop_and_resize(m[..., None], b[None], s)[0]
        )(masks.astype(jnp.float32), nrm)
        crops = jnp.concatenate([rgb, mask_ch], -1)
        logits = models.refine.apply(params["refine"], crops)
        return refined_fullres(logits, crop_boxes, valid, h, w) > 0.5

    for t in range(len(seq["frames"])):
        path = props_dir / f"frame_{t:05d}.json"
        props = load_proposals(path, n, (h, w))
        refined = refine_one(
            jnp.asarray(seq["frames"][t]), jnp.asarray(props.boxes),
            jnp.asarray(props.masks), jnp.asarray(props.valid),
        )
        props.masks = np.asarray(refined).astype(np.uint8)
        save_proposals(path, props)
    get_logger().info("refine: rewrote %d frames in %s", len(seq["frames"]), props_dir)


def stage_flow(args):
    """Stage 3 → WORK/flow/<seq>/%05d.flo (flow of frame t → frame t−1)."""
    cfg, models, params, ds, seq = _setup(args)
    from premvos_tpu.stages.flow import run_flow_pairs

    out = Path(args.work) / "flow" / args.seq
    out.mkdir(parents=True, exist_ok=True)
    frames = jnp.asarray(to_unit(jnp.asarray(seq["frames"])))
    flow = run_flow_pairs(
        models.flow, params["flow"], frames,
        infer_hw=(cfg.flow.infer_height, cfg.flow.infer_width),
    )
    flow = np.asarray(flow)
    for t in range(flow.shape[0]):
        write_flo(out / f"{t + 1:05d}.flo", flow[t])
    get_logger().info("flow: wrote %d fields to %s", flow.shape[0], out)


def stage_reid(args):
    """Stage 4: append 'ReID' embeddings to the proposals JSON."""
    cfg, models, params, ds, seq = _setup(args)
    from premvos_tpu.stages.reid import run_reid

    props_dir = Path(args.work) / "proposals" / args.seq
    h, w = cfg.pipeline.image_height, cfg.pipeline.image_width
    n = cfg.pipeline.max_proposals

    embed = jax.jit(
        lambda frame, b, v: run_reid(
            models.reid, params["reid"], normalize(to_unit(frame)), b, v,
            cfg.reid.crop_size,
        )
    )
    for t in range(len(seq["frames"])):
        path = props_dir / f"frame_{t:05d}.json"
        props = load_proposals(path, n, (h, w))
        emb = embed(
            jnp.asarray(seq["frames"][t]), jnp.asarray(props.boxes),
            jnp.asarray(props.valid),
        )
        props.embeddings = np.asarray(emb)
        save_proposals(path, props)
    get_logger().info("reid: embedded %d frames in %s", len(seq["frames"]), props_dir)


def stage_merge(args):
    """Stage 5: JSONs + .flo + GT → indexed PNGs (+ J&F if GT available)."""
    cfg, models, params, ds, seq = _setup(args)
    from premvos_tpu.stages.merge import init_state, merge_frame
    from premvos_tpu.stages.reid import run_reid
    from premvos_tpu.pipeline.runner import boxes_from_masks

    props_dir = Path(args.work) / "proposals" / args.seq
    flow_dir = Path(args.work) / "flow" / args.seq
    h, w = cfg.pipeline.image_height, cfg.pipeline.image_width
    n = cfg.pipeline.max_proposals

    gt_masks = jnp.asarray(seq["gt_masks"])
    gt_boxes = boxes_from_masks(gt_masks)
    k = gt_masks.shape[0]
    gt_valid = jnp.arange(k) < seq["num_objects"]
    gt_emb = run_reid(
        models.reid, params["reid"],
        normalize(to_unit(jnp.asarray(seq["frames"][0]))), gt_boxes, gt_valid,
        cfg.reid.crop_size,
    )
    state = init_state(gt_masks, gt_emb, seq["num_objects"])

    step = jax.jit(
        lambda st, m, s_, e, v, fl: merge_frame(st, m, s_, e, v, fl, cfg.merge)
    )
    ids = np.arange(1, k + 1)[:, None, None]
    lab0 = (np.asarray(gt_masks) > 0.5) * ids * np.asarray(gt_valid)[:, None, None]
    labels = [lab0.max(0).astype(np.uint8)]
    for t in range(1, len(seq["frames"])):
        props = load_proposals(props_dir / f"frame_{t:05d}.json", n, (h, w))
        emb = props.embeddings
        if emb is None:
            raise SystemExit("run the reid stage first (no ReID in JSON)")
        flow = read_flo(flow_dir / f"{t:05d}.flo")
        state, lab, _ = step(
            state,
            jnp.asarray(props.masks, jnp.float32),
            jnp.asarray(props.scores),
            jnp.asarray(emb),
            jnp.asarray(props.valid),
            jnp.asarray(flow),
        )
        labels.append(np.asarray(lab).astype(np.uint8))

    labels = np.stack(labels)
    out = Path(args.work) / "results"
    save_results(out, args.seq, crop_result(labels, seq["orig_hw"]))
    get_logger().info("merge: wrote %d PNGs to %s", len(labels), out / args.seq)

    if len(seq["gt_labels"]) == len(labels):
        from premvos_tpu.eval.davis_eval import evaluate_sequence

        r = evaluate_sequence(labels, seq["gt_labels"], seq["num_objects"])
        print({"J": r["J"], "F": r["F"], "J&F": r["J&F"]})


STAGES = {
    "proposals": stage_proposals,
    "refine": stage_refine,
    "flow": stage_flow,
    "reid": stage_reid,
    "merge": stage_merge,
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("stage", choices=sorted(STAGES))
    ap.add_argument("--davis_root", required=True)
    ap.add_argument("--seq", required=True)
    ap.add_argument("--work", required=True)
    ap.add_argument("--config", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--max_frames", type=int, default=None)
    args = ap.parse_args(argv)
    STAGES[args.stage](args)


if __name__ == "__main__":
    main()
