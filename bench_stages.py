"""Per-stage benchmarks matching BASELINE.json's five benchmark configs.

The driver consumes bench.py (one line, full pipeline); this script prints
one JSON line per BASELINE.json config entry for per-stage evidence:

  1. Mask R-CNN proposal generation, single DAVIS 480p frame
  2. DeepLabv3+ refinement on a batch of box crops
  3. FlowNet2 flow on a frame pair + mask warping (propagation score path)
  4. ReID embeddings on proposal crops + pairwise distance matrix
  5. full merge/track pipeline (multi-object)

Fresh inputs every run (identical buffers get memoized on this platform).
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/premvos_jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/premvos_jax_cache")

import jax.numpy as jnp
import numpy as np


def timed(fn, make_args, runs=3):
    jax.block_until_ready(fn(*make_args(0)))  # compile
    jax.block_until_ready(fn(*make_args(1)))  # flush pipelined dispatch
    t0 = time.perf_counter()
    for s in range(2, 2 + runs):
        out = fn(*make_args(s))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / runs


def emit(name, seconds, unit_count, unit):
    print(
        json.dumps(
            {
                "metric": name,
                "value": round(unit_count / seconds, 3),
                "unit": unit,
                "ms_per_batch": round(seconds * 1000, 2),
            }
        )
    )


def main():
    from premvos_tpu.config import PremvosConfig
    from premvos_tpu.pipeline.runner import (
        build_models, get_anchors, init_params, run_sequence,
    )
    from premvos_tpu.stages.flow import warp_masks
    from premvos_tpu.stages.reid import pairwise_sq_distances

    cfg = PremvosConfig()
    models = build_models(cfg)
    params = init_params(models, cfg, jax.random.PRNGKey(0))
    anchors = get_anchors(cfg)
    p = cfg.pipeline
    h, w = p.image_height, p.image_width

    def fresh(seed, shape, dtype=jnp.float32):
        return jnp.asarray(
            np.random.default_rng(seed).standard_normal(shape), dtype
        )

    # 1. proposals
    f1 = jax.jit(lambda pr, x: models.maskrcnn.apply(pr, x, anchors))
    dt = timed(f1, lambda s: (params["maskrcnn"], fresh(s, (1, h, w, 3))))
    emit("maskrcnn_proposals_480p", dt, 1, "frames/sec")

    # 2. refinement crops
    n = p.max_proposals
    s_ = cfg.refine.crop_size
    f2 = jax.jit(lambda pr, x: models.refine.apply(pr, x))
    dt = timed(f2, lambda s: (params["refine"], fresh(s, (n, s_, s_, 4))))
    emit("deeplab_refine_crops", dt, n, "crops/sec")

    # 3. flow + mask warp
    fh, fw = cfg.flow.infer_height, cfg.flow.infer_width

    def flow_and_warp(pr, a, b, masks):
        fl = models.flow.apply(pr, a, b)[0]
        fl = jax.image.resize(fl, (h, w, 2), "bilinear") * jnp.array(
            [w / fw, h / fh]
        )
        return warp_masks(masks, fl)

    f3 = jax.jit(flow_and_warp)
    dt = timed(
        f3,
        lambda s: (
            params["flow"],
            fresh(s, (1, fh, fw, 3)),
            fresh(s + 100, (1, fh, fw, 3)),
            (fresh(s + 200, (p.max_objects, h, w)) > 0).astype(jnp.float32),
        ),
    )
    emit("flownet2_pair_plus_mask_warp", dt, 1, "pairs/sec")

    # 4. reid + distance matrix
    cs = cfg.reid.crop_size

    def reid_and_dist(pr, crops, ref):
        emb = models.reid.apply(pr, crops)
        return pairwise_sq_distances(ref, emb)

    f4 = jax.jit(reid_and_dist)
    dt = timed(
        f4,
        lambda s: (
            params["reid"],
            fresh(s, (n, cs, cs, 3)),
            fresh(s + 300, (p.max_objects, cfg.reid.embedding_dim)),
        ),
    )
    emit("reid_embeddings_plus_distances", dt, n, "crops/sec")

    # 5. full pipeline (same as bench.py)
    t = 9
    gt = np.zeros((p.max_objects, h, w), np.float32)
    gt[0, 100:200, 150:300] = 1.0
    gt[1, 250:350, 500:650] = 1.0
    gt = jnp.asarray(gt)

    def full(frames):
        return run_sequence(models, params, cfg, frames, gt, jnp.int32(2))

    dt = timed(
        full,
        lambda s: (
            jnp.asarray(
                np.random.default_rng(s).integers(0, 255, (t, h, w, 3)),
                jnp.uint8,
            ),
        ),
    )
    emit("full_merge_track_pipeline", dt, t - 1, "frames/sec")


if __name__ == "__main__":
    main()
