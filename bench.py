"""Headline benchmark: end-to-end fused-pipeline throughput, frames/sec/chip.

Runs the full PReMVOS pipeline (ResNet-101-FPN Mask R-CNN proposals →
DeepLabv3+ refinement of 32 padded proposals → FlowNet2 → ReID embeddings →
merge/track) on synthetic DAVIS-480p-shaped frames — stages 1–4 batched over
scan_chunk-frame chunks, merge scanned — and prints ONE JSON line.

Baseline: the reference end-to-end rate is ~38 s/frame on a single GPU
(≈ 0.0263 fps; BASELINE.md — includes amortized per-video fine-tuning, the
closest published figure). vs_baseline = our_fps / 0.0263.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/premvos_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_FPS = 1.0 / 38.0


def main():
    import dataclasses

    from premvos_tpu.config import MergeConfig, PremvosConfig
    from premvos_tpu.pipeline.runner import build_models, init_params, run_sequence

    # Production perf preset (mirrors configs/davis2017_val.json): coarse
    # stride-2 mask warp + bf16 crop/paste interpolation. Config defaults
    # are the exact/parity settings (stride 1, fp32 interp); the perf
    # choices' held-out J&F impact is recorded in
    # docs/SYNTHETIC_BENCHMARK.json.
    base = PremvosConfig()
    cfg = dataclasses.replace(
        base,
        merge=dataclasses.replace(base.merge, warp_stride=2),
        refine=dataclasses.replace(base.refine, interp_precision="default"),
    )
    models = build_models(cfg)
    params = init_params(models, cfg, jax.random.PRNGKey(0))

    p = cfg.pipeline
    t = 33  # realistic DAVIS sequence chunk; amortizes the ~120 ms
    #           fixed per-dispatch relay overhead (sequences are 25-104 frames)

    def make_frames(seed):
        # Fresh data every run: reusing identical device buffers was observed
        # to short-circuit execution on this platform and report impossible
        # (>peak-FLOPs) rates.
        r = np.random.default_rng(seed)
        return jnp.asarray(
            r.integers(0, 255, (t, p.image_height, p.image_width, 3)),
            jnp.uint8,
        )

    gt = np.zeros((p.max_objects, p.image_height, p.image_width), np.float32)
    gt[0, 100:200, 150:300] = 1.0
    gt[1, 250:350, 500:650] = 1.0
    gt = jnp.asarray(gt)
    n_obj = jnp.int32(2)

    # Warmup/compile + one fresh-data run to flush any pipelined dispatch.
    for seed in (0, 1):
        labels = run_sequence(models, params, cfg, make_frames(seed), gt, n_obj)
        jax.block_until_ready(labels)

    # Measure per run, MEDIAN of 5. Platform defenses: fresh inputs every
    # run (identical buffers were observed to memoize); input uploads fenced
    # BEFORE the timer (jnp.asarray is async — an in-flight 41 MB upload
    # otherwise lands inside the timed region and measures the relay tunnel,
    # not the chip); completion fenced by a 1-element device→host read of
    # the last frame (which depends on the whole scan) — block_until_ready
    # through this remote relay was observed returning before execution
    # (impossible >peak-FLOPs rates), while a host read cannot complete
    # until the result actually exists.
    runs = 5
    times = []
    sink = 0
    for seed in range(2, 2 + runs):
        frames = make_frames(seed)
        jax.block_until_ready(frames)
        start = time.perf_counter()
        labels = run_sequence(models, params, cfg, frames, gt, n_obj)
        sink += int(np.asarray(labels[-1, 0, 0]))
        times.append(time.perf_counter() - start)

    fps = (t - 1) / sorted(times)[len(times) // 2]
    assert sink >= 0  # keep the transfer live
    print(
        json.dumps(
            {
                "metric": "davis480p_e2e_pipeline_throughput",
                "value": round(fps, 3),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / REFERENCE_FPS, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
