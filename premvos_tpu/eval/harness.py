"""Shared precompute/evaluate harness for merge-weight experiments.

The merge stage is the only part of the pipeline that depends on
MergeConfig, so every experiment that varies merge weights (the tuning
harness, the ablation table, the warp-stride comparison) precomputes stages
1–4 ONCE per sequence (pipeline.runner.precompute_sequence) and replays only
the cheap merge scan per candidate — weights are traced, so one compilation
serves every candidate (see scripts/tune_merge.py cost notes).

Weight vector convention ([9], matching runner.merge_labels_from_precomputed;
[6]/[8] prefixes are also accepted there for back-compat):
  (w_objectness, w_reid, w_warp, w_overlap, reid_sigma,
   new_object_score_floor, warp_decay, reid_ema, reid_reacquire)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Defaults = exact reference semantics (warp_decay 1.0, reid_ema 0.0,
# reid_reacquire 2.0 = disabled since sim ≤ 1).
DEFAULT_WEIGHTS = np.array(
    [1.0, 1.0, 1.0, 1.0, 1.0, 0.0, 1.0, 0.0, 2.0], np.float32
)
WEIGHT_NAMES = (
    "w_objectness", "w_reid", "w_warp", "w_overlap", "reid_sigma",
    "new_object_score_floor", "warp_decay", "reid_ema", "reid_reacquire",
)


def weights_from_merge_cfg(cfg_m) -> np.ndarray:
    return np.array(
        [
            cfg_m.w_objectness, cfg_m.w_reid, cfg_m.w_warp, cfg_m.w_overlap,
            cfg_m.reid_sigma, cfg_m.new_object_score_floor,
            cfg_m.warp_decay, cfg_m.reid_ema, cfg_m.reid_reacquire,
        ],
        np.float32,
    )


def precompute_split(
    models, params, cfg, ds, sequences=None, max_frames=None, verbose=True
) -> list:
    """Stages 1–4 for each sequence of a split.

    Returns a list of (pre, gt_masks, num_objects, gt_labels) — gt_labels
    already cropped to the sequence's own original resolution (sequences in
    a real dataset can differ in size).
    """
    from premvos_tpu.pipeline.runner import precompute_sequence

    p = cfg.pipeline
    out = []
    for seq in sequences if sequences is not None else ds.sequences:
        data = ds.load_sequence(
            seq, p.image_height, p.image_width, p.max_objects,
            max_frames=max_frames,
        )
        frames = jnp.asarray(data["frames"])
        gt_masks = jnp.asarray(data["gt_masks"])
        n_obj = jnp.int32(data["num_objects"])
        pre = precompute_sequence(models, params, cfg, frames, gt_masks, n_obj)
        oh, ow = data["orig_hw"]
        out.append(
            (pre, gt_masks, n_obj, np.asarray(data["gt_labels"])[:, :oh, :ow])
        )
        if verbose:
            print(f"[precompute] {seq}: {frames.shape[0]} frames", flush=True)
    return out


def evaluate_weights(
    precomputed: list, weights, warp_stride: int = 1, warp_impl: str = "block"
):
    """Mean J&F of one weight vector across precomputed sequences.

    Returns (dataset J&F, per-sequence result list)."""
    from premvos_tpu.eval.davis_eval import evaluate_dataset, evaluate_sequence
    from premvos_tpu.pipeline.runner import merge_labels_from_precomputed

    results = []
    w = jnp.asarray(weights)
    for pre, gt_masks, num_objects, gt_labels in precomputed:
        labels = np.asarray(
            merge_labels_from_precomputed(
                pre, gt_masks, num_objects, w, warp_stride=warp_stride,
                warp_impl=warp_impl,
            )
        )
        labels = labels[:, : gt_labels.shape[1], : gt_labels.shape[2]]
        results.append(evaluate_sequence(labels, gt_labels, int(num_objects)))
    return evaluate_dataset(results)["J&F"], results
