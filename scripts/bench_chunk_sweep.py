"""Sweep scan_chunk (stage batching) for the fused pipeline on the TPU.

Measures e2e throughput at several scan_chunk values with the bench.py
methodology (fresh inputs, forced transfer, median), same T, one process —
the controlled experiment for picking PipelineConfig.scan_chunk.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/premvos_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from premvos_tpu.config import PremvosConfig
    from premvos_tpu.pipeline.runner import build_models, init_params, run_sequence

    chunks = [int(x) for x in (sys.argv[1:] or ["1", "4", "8"])]
    t = 33
    base = PremvosConfig()
    p = base.pipeline
    models = build_models(base)
    params = init_params(models, base, jax.random.PRNGKey(0))
    gt = np.zeros((p.max_objects, p.image_height, p.image_width), np.float32)
    gt[0, 100:200, 150:300] = 1.0
    gt[1, 250:350, 500:650] = 1.0
    gt = jnp.asarray(gt)

    def frames(seed):
        r = np.random.default_rng(seed)
        return jnp.asarray(
            r.integers(0, 255, (t, p.image_height, p.image_width, 3)), jnp.uint8
        )

    for chunk in chunks:
        cfg = dataclasses.replace(
            base, pipeline=dataclasses.replace(p, scan_chunk=chunk)
        )
        m = build_models(cfg)
        tc0 = time.time()
        for seed in (0, 1):  # compile + flush
            lab = run_sequence(m, params, cfg, frames(seed), gt, jnp.int32(2))
            np.asarray(lab[-1, 0, 0])
        compile_s = time.time() - tc0
        times = []
        for seed in range(2, 7):
            f = frames(seed)
            jax.block_until_ready(f)  # uploads are async: fence them first
            t0 = time.perf_counter()
            lab = run_sequence(m, params, cfg, f, gt, jnp.int32(2))
            # 1-element read fences completion without a bulk download
            _ = np.asarray(lab[-1, 0, 0])
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        print(
            json.dumps(
                {
                    "scan_chunk": chunk,
                    "fps": round((t - 1) / med, 3),
                    "ms_per_frame": round(med / (t - 1) * 1000, 1),
                    "median_s": round(med, 3),
                    "all_s": [round(x, 3) for x in times],
                    "compile_warmup_s": round(compile_s, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
