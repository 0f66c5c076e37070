"""In-situ check: fused Pallas align inside full Mask R-CNN vs XLA path.

Compares detections (boxes/scores/valid/mask logits) and marginal runtime
with PREMVOS_FUSED_ALIGN on/off at the production config on TPU — the
decisive experiment for making the kernel the default (round-1's in-situ
wiring regressed 10× with vanishing detections; the level-sorted round-2
kernel must prove itself here).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/premvos_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def timed_med(fn, mk, runs=7):
    a = mk(0)
    jax.block_until_ready(a)
    out = fn(*a)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    ts = []
    for s in range(1, 1 + runs):
        a = mk(s)
        jax.block_until_ready(a)
        t0 = time.perf_counter()
        out = fn(*a)
        _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    import premvos_tpu.models.maskrcnn as mk_mod
    from premvos_tpu.config import PremvosConfig
    from premvos_tpu.data.preprocess import normalize
    from premvos_tpu.pipeline.runner import build_models, get_anchors, init_params

    cfg = PremvosConfig()
    models = build_models(cfg)
    params = init_params(models, cfg, jax.random.PRNGKey(0))
    anchors = get_anchors(cfg)
    p = cfg.pipeline
    h, w = p.image_height, p.image_width

    def fresh(seed, b):
        r = np.random.default_rng(seed)
        return normalize(
            jnp.asarray(r.integers(0, 255, (b, h, w, 3)), jnp.uint8) / 255.0
        )

    results = {}
    dets = {}
    for mode in ("0", "1"):
        os.environ["PREMVOS_FUSED_ALIGN"] = mode
        f = jax.jit(lambda pr, x: models.maskrcnn.apply(pr, x, anchors))
        d = f(params["maskrcnn"], fresh(42, 4))
        dets[mode] = jax.tree.map(np.asarray, d)
        m1 = timed_med(f, lambda s: (params["maskrcnn"], fresh(s, 4)))
        m2 = timed_med(f, lambda s: (params["maskrcnn"], fresh(s, 8)))
        results[mode] = ((m2 - m1) / 4, m1, m2)
        f.clear_cache()
        print(
            json.dumps(
                {
                    "fused": mode,
                    "marginal_ms_per_frame": round((m2 - m1) / 4 * 1e3, 2),
                    "b4_ms": round(m1 * 1e3, 1),
                    "b8_ms": round(m2 * 1e3, 1),
                }
            ),
            flush=True,
        )

    a, b = dets["0"], dets["1"]
    n_match = int((a["valid"] == b["valid"]).mean() * 100)
    va = a["valid"] & b["valid"]
    box_d = float(np.abs(a["boxes"] - b["boxes"])[va].max()) if va.any() else 0.0
    sc_d = float(np.abs(a["scores"] - b["scores"])[va].max()) if va.any() else 0.0
    print(
        json.dumps(
            {
                "valid_agreement_pct": n_match,
                "n_detections_xla": int(a["valid"].sum()),
                "n_detections_fused": int(b["valid"].sum()),
                "max_box_delta_px": round(box_d, 2),
                "max_score_delta": round(sc_d, 4),
                "speedup_marginal": round(results["0"][0] / results["1"][0], 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
