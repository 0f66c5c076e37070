"""Merge-weight tuning harness: random search over MergeConfig vs J&F.

The reference ships hand-tuned merge score weights (SURVEY.md C5 — merge
script constants, unverified); this repo defaults them to 1.0. This harness
searches (w_objectness, w_reid, w_warp, w_overlap, reid_sigma,
new_object_score_floor) against J&F on a validation split.

Cost structure: stages 1–4 (proposals/refine/flow/ReID) do not depend on
merge weights, so they are precomputed ONCE per sequence
(pipeline.runner.precompute_sequence) and every candidate replays only the
merge scan (merge_labels_from_precomputed — weights are traced, one compile
total).

Usage:
  python scripts/tune_merge.py --synthetic --trials 64        # self-contained
  python scripts/tune_merge.py --data /path/DAVIS --trials 256 \
      --checkpoint ckpt_dir --out configs/merge_tuned.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import os as _os

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/premvos_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


from premvos_tpu.eval.harness import (  # noqa: E402
    DEFAULT_WEIGHTS,
    WEIGHT_NAMES,
    evaluate_weights as evaluate_candidate,
)


def sample_weights(rng: np.random.Generator) -> np.ndarray:
    """Log-uniform weights, uniform score floor; warp_decay/reid_ema/
    reid_reacquire mix the reference value (1.0 / 0.0 / disabled — half the
    mass) with a search range, so the extensions only survive tuning when
    they actually earn their keep."""
    w = np.exp(rng.uniform(np.log(0.2), np.log(3.0), size=4))
    sigma = np.exp(rng.uniform(np.log(0.3), np.log(3.0)))
    floor = rng.uniform(0.0, 1.5)
    decay = 1.0 if rng.random() < 0.5 else rng.uniform(0.4, 1.0)
    ema = 0.0 if rng.random() < 0.5 else rng.uniform(0.0, 0.5)
    # ReID-gated floor relief (sim ∈ (0,1]; 2.0 = disabled): only useful
    # where the floor bites, so sample the confident-sim band when on.
    reacq = 2.0 if rng.random() < 0.5 else rng.uniform(0.4, 0.98)
    return np.array([*w, sigma, floor, decay, ema, reacq], np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", help="DAVIS root (JPEGImages/Annotations)")
    ap.add_argument("--synthetic", action="store_true",
                    help="tune on generated moving-squares sequences")
    ap.add_argument("--demo", action="store_true",
                    help="tune on the trained synthetic-accuracy demo setup "
                         "(scripts/train_synthetic_demo.py config + its "
                         "--save-params checkpoint via --checkpoint)")
    ap.add_argument("--benchmark", action="store_true",
                    help="tune against the held-out synthetic VOS benchmark "
                         "(scripts/run_synthetic_benchmark.py config + its "
                         "--save-params checkpoint via --checkpoint): search "
                         "on the TUNE split, then report the best weights' "
                         "J&F on the UNSEEN val split")
    ap.add_argument("--split", default="val")
    ap.add_argument("--trials", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--config", help="JSON config preset")
    ap.add_argument("--checkpoint", help="orbax checkpoint dir (else random)")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--max-seqs", type=int, default=None)
    ap.add_argument("--out", default="configs/merge_tuned.json")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (leaves the TPU free)")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from premvos_tpu.config import PremvosConfig, load_config
    from premvos_tpu.data.davis import DavisDataset, make_synthetic_davis
    from premvos_tpu.pipeline.runner import build_models, init_params

    if args.demo:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
        from train_synthetic_demo import demo_config

        cfg = demo_config()
    elif args.benchmark:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
        from run_synthetic_benchmark import bench_config

        cfg = bench_config()
    elif args.config:
        cfg = load_config(args.config)
    elif args.synthetic:
        # Small nets + canvas so the harness runs anywhere (incl. CPU CI).
        import dataclasses

        from premvos_tpu.config import (
            FlowConfig, PipelineConfig, ProposalConfig, RefineConfig,
            ReIDConfig,
        )

        cfg = PremvosConfig(
            proposal=ProposalConfig(
                backbone_depth=26, fpn_channels=32, rpn_pre_nms_topk=32,
                rpn_post_nms_topk=8, detections_per_frame=4,
            ),
            refine=RefineConfig(crop_size=33, backbone_depth=26),
            flow=FlowConfig(variant="flownetc", max_displacement=4,
                            infer_height=64, infer_width=64),
            reid=ReIDConfig(backbone_depth=26, embedding_dim=8, crop_size=32),
            pipeline=PipelineConfig(image_height=64, image_width=96,
                                    max_objects=2, max_proposals=4,
                                    dtype="float32", scan_chunk=4),
        )
    else:
        cfg = PremvosConfig()

    if args.demo:
        root = tempfile.mkdtemp(prefix="tune_merge_demo_")
        make_synthetic_davis(root, sequences=("demo",), t=10,
                             hw=(cfg.pipeline.image_height,
                                 cfg.pipeline.image_width), num_objects=2)
        args.data = root
    elif args.benchmark:
        from premvos_tpu.data.synthetic_vos import make_synthetic_vos

        root = args.data or tempfile.mkdtemp(prefix="tune_merge_bench_")
        if not os.path.exists(os.path.join(root, "ImageSets")):
            # Same split sizes/seed as run_synthetic_benchmark defaults so
            # the generated tune/val sequences are IDENTICAL to the
            # benchmark run's (the master RNG draws per sequence in split
            # order). Prefer passing the benchmark's own --data-root.
            make_synthetic_vos(
                root, n_train=6, n_tune=2, n_val=4, t=24,
                hw=(cfg.pipeline.image_height, cfg.pipeline.image_width),
                seed=args.seed, flow_pairs=False,
            )
        args.data = root
        args.split = "tune"
    elif args.synthetic:
        root = tempfile.mkdtemp(prefix="tune_merge_synth_")
        make_synthetic_davis(root, sequences=("seq_a", "seq_b"), t=6,
                             hw=(64, 96), num_objects=2)
        args.data = root
    if not args.data:
        ap.error("--data or --synthetic required")

    ds = DavisDataset(args.data, split=args.split)
    models = build_models(cfg)
    params = init_params(models, cfg, jax.random.PRNGKey(0))
    if args.checkpoint:
        from premvos_tpu.utils.checkpoint import load_params

        params = load_params(args.checkpoint, like=params)

    from premvos_tpu.eval.harness import precompute_split

    sequences = ds.sequences[: args.max_seqs]
    precomputed = precompute_split(
        models, params, cfg, ds, sequences, max_frames=args.max_frames
    )

    rng = np.random.default_rng(args.seed)
    best_w, best_score = DEFAULT_WEIGHTS, -1.0
    ws = cfg.merge.warp_stride
    baseline, _ = evaluate_candidate(precomputed, DEFAULT_WEIGHTS, ws)
    print(f"[tune] baseline (all-1.0) J&F = {baseline:.4f}", flush=True)
    best_score = baseline
    for t in range(args.trials):
        w = sample_weights(rng)
        score, _ = evaluate_candidate(precomputed, w, ws)
        mark = ""
        if score > best_score:
            best_w, best_score, mark = w, score, "  ← best"
        print(f"[tune] {t + 1}/{args.trials} J&F={score:.4f} "
              f"w={np.round(w, 3).tolist()}{mark}", flush=True)

    out = {
        "merge": {
            **{k: float(v) for k, v in zip(WEIGHT_NAMES, best_w)},
        },
        "_tuning": {
            "J&F": best_score,
            "baseline_J&F": baseline,
            "trials": args.trials,
            "split": args.split,
            "synthetic": bool(args.synthetic),
            "sequences": list(sequences),
        },
    }
    if args.benchmark:
        # Report the tuned weights on the UNSEEN val split — the search
        # only ever saw the tune split.
        ds_val = DavisDataset(args.data, split="val")
        pre_val = precompute_split(models, params, cfg, ds_val)
        val_best, _ = evaluate_candidate(pre_val, best_w, ws)
        val_base, _ = evaluate_candidate(pre_val, DEFAULT_WEIGHTS, ws)
        out["_tuning"]["val_J&F"] = float(val_best)
        out["_tuning"]["val_baseline_J&F"] = float(val_base)
        print(f"[tune] held-out val: tuned {val_best:.4f} vs baseline "
              f"{val_base:.4f}", flush=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"[tune] best J&F = {best_score:.4f} → {args.out}", flush=True)


if __name__ == "__main__":
    main()
