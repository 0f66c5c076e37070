"""Benchmark: level-sorted fused Pallas multilevel RoIAlign vs XLA 4-level.

Identical harness for both paths (fresh inputs, forced device→host
transfer, median of runs, two-size slope for the marginal) at the two
production geometries: the box head (post-NMS RoIs, P=7) and the mask head
(detections, P=14). Also checks bf16 parity in situ-like conditions.

Run on the real TPU:  python scripts/bench_fused_align.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/premvos_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from premvos_tpu.models.maskrcnn import multilevel_roi_align, roi_levels
from premvos_tpu.ops.pallas.multilevel_roi_align_pallas import (
    multilevel_roi_align_pallas,
)

H, W = 480, 864
C = 256
SHAPES = {  # FPN P2..P5 at DAVIS-480p canvas
    "P2": (H // 4, W // 4, C),
    "P3": (H // 8, W // 8, C),
    "P4": (H // 16, W // 16, C),
    "P5": (H // 32, W // 32, C),
}


def make_inputs(seed, n, dtype):
    r = np.random.default_rng(seed)
    feats = {
        k: jnp.asarray(r.standard_normal(s), dtype) for k, s in SHAPES.items()
    }
    sizes = r.uniform(16.0, 500.0, (n,))
    cx = r.uniform(0, W, (n,))
    cy = r.uniform(0, H, (n,))
    boxes = jnp.asarray(
        np.stack([cx - sizes / 2, cy - sizes / 2, cx + sizes / 2, cy + sizes / 2], 1),
        jnp.float32,
    )
    return feats, boxes


def timed_med(fn, make_args, runs=5):
    out = fn(*make_args(0))
    np.asarray(out)
    ts = []
    for s in range(1, 1 + runs):
        a = make_args(s)
        t0 = time.perf_counter()
        out = fn(*a)
        _ = np.asarray(out)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def bench_geometry(n, p, s, dtype, label):
    xla = jax.jit(
        lambda f2, f3, f4, f5, b: multilevel_roi_align(
            {"P2": f2, "P3": f3, "P4": f4, "P5": f5}, b, p, s
        )
    )
    pal = jax.jit(
        lambda f2, f3, f4, f5, b: multilevel_roi_align_pallas(
            f2, f3, f4, f5, b, roi_levels(b), p, s
        )
    )

    def args(seed):
        feats, boxes = make_inputs(seed, n, dtype)
        return feats["P2"], feats["P3"], feats["P4"], feats["P5"], boxes

    # parity first
    a = args(123)
    want = np.asarray(xla(*a), np.float32)
    got = np.asarray(pal(*a), np.float32)
    denom = np.abs(want).mean() + 1e-6
    err = np.abs(got - want).max() / denom
    t_xla = timed_med(xla, args)
    t_pal = timed_med(pal, args)
    print(
        f"[{label}] n={n} p={p} dtype={dtype.__name__}: "
        f"xla={t_xla * 1e3:.2f}ms pallas={t_pal * 1e3:.2f}ms "
        f"speedup={t_xla / t_pal:.2f}x rel_err={err:.2e}",
        flush=True,
    )
    return t_xla, t_pal, err


def main():
    print(f"devices: {jax.devices()}", flush=True)
    for dtype in (jnp.float32, jnp.bfloat16):
        bench_geometry(256, 7, 2, dtype, "box-head")
        bench_geometry(32, 14, 2, dtype, "mask-head")


if __name__ == "__main__":
    main()
