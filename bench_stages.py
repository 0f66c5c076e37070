"""Per-stage device-time budget (and BASELINE.json per-stage evidence).

Methodology (see README "Timing methodology"): on this platform
`block_until_ready` can return before execution completes and identical
buffers get memoized, so every measurement here uses
  * fresh inputs every run,
  * a forced device→host transfer inside the timed region,
  * the MEDIAN of several runs,
  * and, for the marginal (per-frame / per-crop) figures, the SLOPE between
    two batch sizes — (t(2B) − t(B)) / B — which cancels the ~100 ms fixed
    per-dispatch relay overhead that makes naive microbenchmarks useless.

Prints one JSON line per stage with both the marginal unit time and the raw
batch wall times, then the full-pipeline figure for cross-checking (the sum
of stage marginals should approximate the e2e marginal; the difference is
the merge scan + scheduling).
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/premvos_jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/premvos_jax_cache")

import jax.numpy as jnp
import numpy as np


# Peak matmul throughput of one TPU v5e (v5 lite) chip, bf16. MFU here is
# the judge's convention: model FLOPs per frame (XLA cost_analysis of the
# exact compiled program) / measured marginal seconds / chip peak.
PEAK_FLOPS = 197e12


def program_flops(fn, *args):
    """FLOPs of one execution of jit(fn)(*args) per XLA's cost model.

    Returns None when the backend doesn't expose cost_analysis (e.g. some
    relay configurations) — callers then omit the MFU column rather than
    publishing a made-up number."""
    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else None
        if not ca:
            return None
        f = ca.get("flops")
        return float(f) if f and f > 0 else None
    except Exception:
        return None


def timed_med(fn, make_args, runs=7):
    """Median wall time of fn, fresh args each run, forced host transfer.

    Inputs are materialized on device BEFORE the timer (jnp.asarray uploads
    are async; through this platform's relay an in-flight upload otherwise
    lands inside the timed region and dominates small kernels)."""
    args0 = make_args(0)
    jax.block_until_ready(args0)
    out = fn(*args0)  # compile
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    times = []
    for s in range(1, 1 + runs):
        args = make_args(s)
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        out = fn(*args)
        # 1-element device->host read: forces completion without charging
        # the tunnel a full-output download.
        _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def marginal(fn, make_args_b, b1, b2, runs=5):
    """Per-unit marginal time via the two-size slope, plus per-unit FLOPs
    via the same slope on XLA's cost model (cancels fixed-cost ops the same
    way the time slope cancels dispatch overhead)."""
    t1 = timed_med(fn, lambda s: make_args_b(s, b1), runs)
    t2 = timed_med(fn, lambda s: make_args_b(s, b2), runs)
    f1 = program_flops(fn, *make_args_b(0, b1))
    f2 = program_flops(fn, *make_args_b(0, b2))
    fl = (f2 - f1) / (b2 - b1) if f1 and f2 else None
    return (t2 - t1) / (b2 - b1), t1, t2, fl


def emit(name, unit_seconds, unit, t1, b1, t2, b2, unit_flops=None,
         per_frame_units=1):
    rec = {
        "metric": name,
        "value": round(1.0 / unit_seconds, 3) if unit_seconds > 0 else None,
        "unit": unit,
        "marginal_ms": round(unit_seconds * 1000, 3),
        "batch_times_ms": {
            str(b1): round(t1 * 1000, 1),
            str(b2): round(t2 * 1000, 1),
        },
    }
    if unit_flops and unit_seconds > 0:
        rec["gflops_per_frame"] = round(
            unit_flops * per_frame_units / 1e9, 1
        )
        rec["mfu_pct"] = round(
            100.0 * unit_flops / unit_seconds / PEAK_FLOPS, 2
        )
    print(json.dumps(rec), flush=True)
    return unit_seconds


def main(argv=None):
    import argparse

    from premvos_tpu.config import PremvosConfig, load_config
    from premvos_tpu.pipeline.runner import (
        build_models, get_anchors, init_params, run_sequence,
    )
    from premvos_tpu.stages.reid import pairwise_sq_distances

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--config", default="configs/davis2017_val.json",
        help="JSON preset; default = the production perf preset so the "
             "stage budget matches bench.py (pass '' for raw defaults)",
    )
    args = ap.parse_args(argv)
    cfg = (
        load_config(args.config)
        if args.config and os.path.exists(args.config)
        else PremvosConfig()
    )
    print(json.dumps({"config": args.config or "defaults"}), flush=True)
    models = build_models(cfg)
    params = init_params(models, cfg, jax.random.PRNGKey(0))
    anchors = get_anchors(cfg)
    p = cfg.pipeline
    h, w = p.image_height, p.image_width
    n = p.max_proposals
    budget = {}

    def fresh(seed, shape, dtype=jnp.float32):
        return jnp.asarray(
            np.random.default_rng(seed).standard_normal(shape), dtype
        )

    # 1. proposals — marginal per frame (batch 4 vs 8, the scan_chunk regime)
    f1 = jax.jit(lambda pr, x: models.maskrcnn.apply(pr, x, anchors))
    m, t1, t2, fl = marginal(
        f1, lambda s, b: (params["maskrcnn"], fresh(s, (b, h, w, 3))), 4, 8
    )
    budget["proposals"] = emit(
        "maskrcnn_proposals_480p", m, "frames/sec (marginal)", t1, 4, t2, 8,
        unit_flops=fl,
    )
    mfu = {"proposals": (m, fl)}

    # 2. refinement — marginal per crop (one frame = max_proposals crops)
    s_ = cfg.refine.crop_size
    f2 = jax.jit(lambda pr, x: models.refine.apply(pr, x))
    m, t1, t2, fl = marginal(
        f2, lambda s, b: (params["refine"], fresh(s, (b, s_, s_, 4))), n, 2 * n
    )
    budget["refine"] = emit(
        "deeplab_refine_crops", m, "crops/sec (marginal)", t1, n, t2, 2 * n,
        unit_flops=fl, per_frame_units=n,
    ) * n  # per frame
    mfu["refine"] = (m, fl)

    # 3a. flow net + upsample — marginal per pair (production structure:
    # the net runs batched over the chunk; the mask warp happens per frame
    # inside the merge scan and is measured separately below).
    fh, fw = cfg.flow.infer_height, cfg.flow.infer_width

    def flow_net(pr, a, b):
        fl = models.flow.apply(pr, a, b)
        return jax.vmap(
            lambda f: jax.image.resize(f, (h, w, 2), "bilinear")
            * jnp.array([w / fw, h / fh])
        )(fl)

    f3 = jax.jit(flow_net)
    m, t1, t2, fl = marginal(
        f3,
        lambda s, b: (
            params["flow"],
            fresh(s, (b, fh, fw, 3)),
            fresh(s + 100, (b, fh, fw, 3)),
        ),
        4, 8,
    )
    budget["flow"] = emit(
        "flownet2_pair_plus_upsample", m, "pairs/sec (marginal)", t1, 4, t2, 8,
        unit_flops=fl,
    )
    mfu["flow"] = (m, fl)

    # 3b. merge-scan mask warp — per frame, unbatched inside a scan exactly
    # like merge_frame, at the production warp_stride.
    from premvos_tpu.stages.flow import warp_masks_coarse

    ws = cfg.merge.warp_stride

    def warp_scan(masks, flows):
        def body(carry, fl):
            wped = warp_masks_coarse(carry, fl, ws)
            return wped, jnp.float32(0)

        out, _ = jax.lax.scan(body, masks, flows)
        return out

    f3b = jax.jit(warp_scan)
    m, t1, t2, fl = marginal(
        f3b,
        lambda s, b: (
            (fresh(s + 200, (p.max_objects, h, w)) > 0).astype(jnp.float32),
            5.0 * fresh(s + 300, (b, h, w, 2)),
        ),
        4, 8,
    )
    budget["merge_warp"] = emit(
        f"merge_mask_warp_stride{ws}", m, "frames/sec (marginal)", t1, 4, t2,
        8, unit_flops=fl,
    )
    mfu["merge_warp"] = (m, fl)

    # 4. reid — marginal per crop
    cs = cfg.reid.crop_size

    def reid_and_dist(pr, crops, ref):
        emb = models.reid.apply(pr, crops)
        return pairwise_sq_distances(ref, emb)

    f4 = jax.jit(reid_and_dist)
    m, t1, t2, fl = marginal(
        f4,
        lambda s, b: (
            params["reid"],
            fresh(s, (b, cs, cs, 3)),
            fresh(s + 300, (p.max_objects, cfg.reid.embedding_dim)),
        ),
        n, 2 * n,
    )
    budget["reid"] = emit(
        "reid_embeddings_plus_distances", m, "crops/sec (marginal)",
        t1, n, t2, 2 * n, unit_flops=fl, per_frame_units=n,
    ) * n  # per frame
    mfu["reid"] = (m, fl)

    # 5. full pipeline — marginal per frame via two sequence lengths
    gt = np.zeros((p.max_objects, h, w), np.float32)
    gt[0, 100:200, 150:300] = 1.0
    gt[1, 250:350, 500:650] = 1.0
    gt = jnp.asarray(gt)

    def full(frames):
        return run_sequence(models, params, cfg, frames, gt, jnp.int32(2))

    def mk(s, t):
        return (
            jnp.asarray(
                np.random.default_rng(s).integers(0, 255, (t, h, w, 3)),
                jnp.uint8,
            ),
        )

    m, t1, t2, fl = marginal(full, mk, 17, 33)
    emit("full_pipeline_e2e", m, "frames/sec (marginal)", t1, 17, t2, 33,
         unit_flops=fl)
    mfu["e2e"] = (m, fl)

    stage_sum = sum(budget.values())
    print(
        json.dumps(
            {
                "metric": "stage_budget_summary",
                "stages_ms_per_frame": {
                    k: round(v * 1000, 2) for k, v in budget.items()
                },
                "stage_sum_ms_per_frame": round(stage_sum * 1000, 2),
                "e2e_marginal_ms_per_frame": round(m * 1000, 2),
                "residual_ms_per_frame_merge_plus_sched": round(
                    (m - stage_sum) * 1000, 2
                ),
                # MFU per stage: XLA-cost-model FLOPs per unit / marginal
                # seconds / chip peak (197 TFLOP/s bf16, TPU v5e).
                "mfu_pct": {
                    k: round(100.0 * f / t / PEAK_FLOPS, 2)
                    for k, (t, f) in mfu.items() if f and t > 0
                },
            }
        ),
        flush=True,
    )

    # 6. per-video fine-tuning, amortized — the baseline's 38 s/frame
    # INCLUDES this (BASELINE.md), so the honest comparison pair is
    # (inference-only fps, fps incl. amortized fine-tune). Measures the
    # SHIPPED FinetuneConfig.method — the fused on-device scan by default
    # (zero host augmentation; the round-3 table measured the host-pool
    # oracle instead, whose aug pool alone cost hundreds of seconds).
    import dataclasses

    from premvos_tpu.finetune.fused import (
        build_fused_runner, finetune_video_fused,
    )
    from premvos_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(1)
    r = np.random.default_rng(0)
    frame0 = r.integers(0, 255, (h, w, 3)).astype(np.uint8)
    lab0 = np.zeros((h, w), np.int32)
    lab0[100:200, 150:300] = 1
    lab0[250:350, 500:650] = 2

    chunk = cfg.finetune.chunk
    built = build_fused_runner(models, cfg, mesh)

    def ft_time(steps):
        ft = dataclasses.replace(cfg.finetune, steps=steps)
        t0 = time.perf_counter()
        finetune_video_fused(models, params, frame0, lab0, mesh, cfg,
                             ft_cfg=ft, seed=steps, built=built)
        return time.perf_counter() - t0

    ft_time(chunk)  # compile both nets' chunk programs
    t_a, t_b = ft_time(chunk), ft_time(3 * chunk)
    per_step = (t_b - t_a) / (2 * chunk)  # one step = refine + proposal
    fixed = max(t_a - chunk * per_step, 0.0)  # inpaint + upload + dispatch
    total_ft = fixed + per_step * cfg.finetune.steps
    frames_per_video = 70  # DAVIS-2017 val mean sequence length ≈ 70
    ft_per_frame = total_ft / frames_per_video
    fps_incl = 1.0 / (m + ft_per_frame)
    print(
        json.dumps(
            {
                "metric": "finetune_amortized",
                "method": cfg.finetune.method,
                "per_step_s": round(per_step, 4),
                "fixed_s_prep_dispatch": round(fixed, 2),
                "total_finetune_s_per_video": round(total_ft, 1),
                "amortized_s_per_frame": round(ft_per_frame, 3),
                "fps_inference_only": round(1.0 / m, 3),
                "fps_incl_finetune": round(fps_incl, 3),
                "vs_baseline_incl_finetune": round(fps_incl * 38.0, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
