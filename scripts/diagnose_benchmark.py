"""Selection-loss diagnosis for the held-out synthetic benchmark.

Replays the merge scan frame-by-frame in Python over precomputed stage
outputs and classifies, per object per frame, where J&F is lost:

  detector_miss    best valid proposal IoU vs GT < 0.3 — stages 1–2 never
                   produced a usable mask (fix: detector/refine training)
  refine_quality   oracle IoU in [0.3, 0.7) — a proposal exists but its
                   mask is poor (fix: refinement)
  selection_error  merge picked a proposal ≥0.1 IoU worse than the oracle
                   pick (fix: merge scoring); the score-term decomposition
                   (objectness / reid / warp / overlap) of oracle-vs-picked
                   is recorded so the offending term is visible
  false_absent_no_proposal    GT-visible object declared absent AND no
                              usable proposal existed (detector's fault)
  false_absent_with_proposal  declared absent despite a ≥0.3-IoU proposal
                              (merge's fault — score floor / terms)
  false_present    object absent in GT but tracker emitted a mask

The reference has no such tool (validation there is end-metric only —
SURVEY.md §4); this exists because the rebuild's benchmark gate (held-out
J&F ≥ 0.6) needs failure attribution, not just a number.

  python scripts/diagnose_benchmark.py --load-params CKPT \
      --data-root DIR --canvas 128 192 [--weights configs/merge_tuned.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/premvos_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def term_matrices(state, warped, pre_t, cfg_m):
    """The four score-term matrices [K, N] for one frame."""
    from premvos_tpu.stages.merge import reid_similarity, soft_mask_iou

    pm, sc, em = pre_t["prop_masks"], pre_t["scores"], pre_t["emb"]
    warp_iou = np.asarray(soft_mask_iou(warped, pm))
    sim = np.asarray(reid_similarity(state.ref_emb, em, cfg_m.reid_sigma))
    total = jnp.sum(warped, axis=0, keepdims=True)
    other = jnp.clip(total - warped, 0.0, 1.0)
    overlap = np.asarray(soft_mask_iou(other, pm))
    decay = np.asarray(
        jnp.power(jnp.float32(cfg_m.warp_decay),
                  state.staleness.astype(jnp.float32))
    )
    obj = np.broadcast_to(np.asarray(sc)[None, :], warp_iou.shape)
    return {
        "objectness": cfg_m.w_objectness * obj,
        "reid": cfg_m.w_reid * sim,
        "warp": cfg_m.w_warp * decay[:, None] * warp_iou,
        "overlap": -cfg_m.w_overlap * overlap,
    }


def diagnose_sequence(pre, gt_masks, n_obj, gt_labels, cfg_m, seq_name):
    from premvos_tpu.stages.merge import (
        init_state, merge_frame, warp_masks_coarse,
    )

    k = int(n_obj)
    t_steps = int(pre["scores"].shape[0])
    h, w = gt_labels.shape[1], gt_labels.shape[2]
    state = init_state(gt_masks, pre["gt_emb"], jnp.int32(k))
    step = jax.jit(lambda st, pm, sc, em, va, fl: merge_frame(
        st, pm, sc, em, va, fl, cfg_m
    ))
    warp_fn = jax.jit(lambda m, f: warp_masks_coarse(
        m, f, cfg_m.warp_stride, cfg_m.warp_impl
    ))

    counts = {
        "frames_objects": 0, "ok": 0, "detector_miss": 0,
        "refine_quality": 0, "selection_error": 0,
        "false_absent_no_proposal": 0, "false_absent_with_proposal": 0,
        "false_present": 0,
    }
    term_blame = {"objectness": 0, "reid": 0, "warp": 0, "overlap": 0}
    events = []

    for t in range(t_steps):
        pre_t = {kk: pre[kk][t] for kk in ("prop_masks", "scores", "emb",
                                           "valid", "flow")}
        warped = warp_fn(state.prev_masks, pre_t["flow"])
        terms = term_matrices(state, warped, pre_t, cfg_m)
        new_state, _, info = step(
            state, pre_t["prop_masks"], pre_t["scores"], pre_t["emb"],
            pre_t["valid"], pre_t["flow"]
        )
        assign = np.asarray(info["assign"])
        present = np.asarray(info["present"])

        pm = np.asarray(pre_t["prop_masks"], np.float32)[:, :h, :w]
        va = np.asarray(pre_t["valid"])
        gt_t = gt_labels[t + 1]

        for ki in range(k):
            g = (gt_t == ki + 1).astype(np.float32)
            gt_vis = g.sum() > 0
            if not gt_vis and not present[ki]:
                continue  # correctly absent — not a scored opportunity
            counts["frames_objects"] += 1
            if not gt_vis and present[ki]:
                counts["false_present"] += 1
                events.append({"seq": seq_name, "t": t + 1, "obj": ki + 1,
                               "kind": "false_present"})
                continue
            inter = np.minimum(pm, g[None]).sum((1, 2))
            union = np.maximum(pm, g[None]).sum((1, 2))
            ious = np.where(va, inter / np.maximum(union, 1e-6), 0.0)
            ob = int(np.argmax(ious))
            oracle_iou = float(ious[ob])
            if not present[ki]:
                # absent with no usable proposal = the detector's fault;
                # absent despite a good proposal = the merge's fault
                kind = ("false_absent_no_proposal" if oracle_iou < 0.3
                        else "false_absent_with_proposal")
                counts[kind] = counts.get(kind, 0) + 1
                events.append({
                    "seq": seq_name, "t": t + 1, "obj": ki + 1,
                    "kind": kind, "oracle_iou": round(oracle_iou, 3),
                })
                continue
            sel = int(assign[ki])
            sel_iou = float(ious[sel]) if sel >= 0 else 0.0
            if oracle_iou < 0.3:
                counts["detector_miss"] += 1
                events.append({
                    "seq": seq_name, "t": t + 1, "obj": ki + 1,
                    "kind": "detector_miss",
                    "oracle_iou": round(oracle_iou, 3),
                })
            elif sel_iou + 0.1 < oracle_iou:
                counts["selection_error"] += 1
                # which term pushed the picked proposal above the oracle one
                diffs = {
                    name: float(m[ki, sel] - m[ki, ob])
                    for name, m in terms.items()
                }
                blame = max(diffs, key=lambda n: diffs[n])
                term_blame[blame] += 1
                events.append({
                    "seq": seq_name, "t": t + 1, "obj": ki + 1,
                    "kind": "selection_error",
                    "oracle_iou": round(oracle_iou, 3),
                    "picked_iou": round(sel_iou, 3),
                    "term_diff_picked_minus_oracle":
                        {n: round(v, 3) for n, v in diffs.items()},
                    "blame": blame,
                })
            elif oracle_iou < 0.7:
                counts["refine_quality"] += 1
            else:
                counts["ok"] += 1
        state = new_state
    return counts, term_blame, events


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--load-params", required=True)
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--split", default="val")
    ap.add_argument("--canvas", type=int, nargs=2, default=None)
    ap.add_argument("--weights", default=None,
                    help="merge_tuned.json-style file; defaults otherwise")
    ap.add_argument("--score-threshold", type=float, default=None)
    ap.add_argument("--max-proposals", type=int, default=None)
    ap.add_argument("--warp-stride", type=int, default=1)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("--max-events", type=int, default=40)
    args = ap.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from run_synthetic_benchmark import bench_config

    from premvos_tpu.config import MergeConfig
    from premvos_tpu.data.davis import DavisDataset
    from premvos_tpu.eval.harness import (
        DEFAULT_WEIGHTS, WEIGHT_NAMES, precompute_split,
    )
    from premvos_tpu.pipeline.runner import build_models, init_params
    from premvos_tpu.utils.checkpoint import load_params

    cfg = bench_config(args.score_threshold, args.max_proposals,
                       tuple(args.canvas) if args.canvas else None)
    models = build_models(cfg)
    params = dict(init_params(models, cfg, jax.random.PRNGKey(0)))
    params = load_params(args.load_params, like=params)

    wvec = np.asarray(DEFAULT_WEIGHTS)
    if args.weights:
        wd = json.load(open(args.weights))["weights"]
        # older tuned records predate trailing knobs — fall back to the
        # reference-semantics default for any name they lack
        wvec = np.array(
            [wd.get(n, d) for n, d in zip(WEIGHT_NAMES, DEFAULT_WEIGHTS)],
            np.float32,
        )
    cfg_m = MergeConfig(
        **dict(zip(WEIGHT_NAMES, [float(x) for x in wvec])),
        warp_stride=args.warp_stride,
    )

    ds = DavisDataset(args.data_root, split=args.split)
    pre = precompute_split(models, params, cfg, ds)

    total = {}
    blame_total = {}
    all_events = []
    for (p_, gm, no, gl), seq in zip(pre, ds.sequences):
        counts, blame, events = diagnose_sequence(p_, gm, no, gl, cfg_m, seq)
        print(f"[diagnose] {seq}: {counts}", flush=True)
        for kk, v in counts.items():
            total[kk] = total.get(kk, 0) + v
        for kk, v in blame.items():
            blame_total[kk] = blame_total.get(kk, 0) + v
        all_events.extend(events)

    report = {
        "weights": dict(zip(WEIGHT_NAMES, [float(x) for x in wvec])),
        "counts": total,
        "selection_error_term_blame": blame_total,
        "events": all_events[: args.max_events],
    }
    print(json.dumps({kk: report[kk] for kk in
                      ("counts", "selection_error_term_blame")}, indent=2))
    if args.out:
        json.dump(report, open(args.out, "w"), indent=2)
        print(f"[diagnose] report → {args.out}")


if __name__ == "__main__":
    main()
