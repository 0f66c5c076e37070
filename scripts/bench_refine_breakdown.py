"""Refinement-stage breakdown: where do the 24.8 ms/frame go, and what do
the candidate optimizations buy?

VERDICT r2 item 7 asks for 0.775 -> <=0.5 ms/crop. STAGE_BUDGET's refine row
times the NET forward only (bench_stages.py:128), so the levers are net-side:

  net385      DeepLabv3+ forward at the reference crop size (385, odd ->
              97/25 internal grids; reference: refinement_net 385x385 crops,
              SURVEY.md C2, *unverified - mount empty*)
  net384      same net at 384 (XLA-friendly 96/24 grids; semantics change is
              one pixel of crop resolution - accuracy impact measured on the
              held-out benchmark before any default changes)
  net_os32    output_stride 32 (stage4 undilated: 4x less stage-4 spatial
              work; DeepLab paper's fast setting)
  crop_paste  the make_refine_crops + refined_fullres einsums at fp32
              (interp 'highest') vs bf16 ('default') - these live in the
              merge/residual rows of the budget, not the refine row

Prints one JSON line per measurement (same fenced-upload + two-size-slope
methodology as bench_stages.py).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/premvos_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from bench_stages import emit, marginal


def main(argv=None):
    import argparse

    from premvos_tpu.config import PremvosConfig, load_config
    from premvos_tpu.models.deeplab import DeepLabV3Plus
    from premvos_tpu.stages.refine import (
        interp_precision, make_refine_crops, refined_fullres,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/davis2017_val.json")
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args(argv)
    cfg = (
        load_config(args.config)
        if args.config and os.path.exists(args.config)
        else PremvosConfig()
    )
    p = cfg.pipeline
    n = p.max_proposals
    dtype = jnp.bfloat16 if p.dtype == "bfloat16" else jnp.float32
    results = {}

    def fresh(seed, shape, d=jnp.float32):
        return jnp.asarray(
            np.random.default_rng(seed).standard_normal(shape), d
        )

    def net_row(name, rcfg, s):
        model = DeepLabV3Plus(rcfg, dtype=dtype)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, s, s, 4)))
        f = jax.jit(lambda pr, x: model.apply(pr, x))
        m, t1, t2 = marginal(
            f, lambda sd, b: (params, fresh(sd, (b, s, s, 4))), n, 2 * n,
            runs=args.runs,
        )
        results[name] = emit(name, m, "crops/sec (marginal)", t1, n, t2, 2 * n)

    s0 = cfg.refine.crop_size
    net_row(f"net{s0}", cfg.refine, s0)
    if s0 != 384:  # even-grid comparison row only when it differs
        net_row("net384", dataclasses.replace(cfg.refine, crop_size=384), 384)
    net_row(
        f"net_os32_{s0}",
        dataclasses.replace(cfg.refine, output_stride=32),
        s0,
    )
    if s0 != 384:
        net_row(
            "net_os32_384",
            dataclasses.replace(cfg.refine, output_stride=32, crop_size=384),
            384,
        )

    # crop+paste einsums per frame (n crops), both interp precisions
    h, w = p.image_height, p.image_width
    s = cfg.refine.crop_size
    for prec_name in ("highest", "default"):
        prec = interp_precision(prec_name)

        def stage(img, boxes, mlog, clog):
            crops, cb = make_refine_crops(
                img, boxes, mlog, s, cfg.refine.box_margin, prec
            )
            full = refined_fullres(clog, cb, jnp.ones(boxes.shape[0]), h, w,
                                   prec)
            # one fused scalar: the single-element host read in marginal()
            # must transitively force BOTH einsum paths into the timed region
            return crops.sum() + full.sum()

        f = jax.jit(stage)

        def mk(sd, b):
            # box CONTENT is timing-irrelevant for XLA (static shapes), but
            # clamp to the image anyway so the benchmarked distribution
            # matches production (no degenerate clipped crops)
            rng = np.random.default_rng(sd)
            x1 = rng.uniform(0, w - 40, b)
            y1 = rng.uniform(0, h - 40, b)
            boxes = np.stack(
                [x1, y1,
                 np.minimum(x1 + rng.uniform(20, 200, b), w - 1.0),
                 np.minimum(y1 + rng.uniform(20, 200, b), h - 1.0)], -1
            ).astype(np.float32)
            return (
                fresh(sd, (h, w, 3)),
                jnp.asarray(boxes),
                fresh(sd + 1, (b, 28, 28)),
                fresh(sd + 2, (b, s, s)),
            )

        m, t1, t2 = marginal(f, mk, n, 2 * n, runs=args.runs)
        results[f"crop_paste_{prec_name}"] = emit(
            f"crop_paste_interp_{prec_name}", m, "crops/sec (marginal)",
            t1, n, t2, 2 * n,
        )

    print(json.dumps({
        "summary_ms_per_crop": {
            k: round(v * 1000, 3) for k, v in results.items()
        },
        "frame_ms_at_n": {
            k: round(v * 1000 * n, 1) for k, v in results.items()
        },
    }), flush=True)


if __name__ == "__main__":
    main()
