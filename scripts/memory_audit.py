"""HBM-footprint audit of the fused fine-tune + pipeline programs.

Round 4's headline metric died on a RESOURCE_EXHAUSTED the first time the
fused per-video fine-tune ran at the production 480p config (BENCH_r04).
This script lowers + COMPILES (never runs) the exact production programs and
prints each one's compiled memory analysis, so footprint regressions are a
compile-time check instead of a mid-benchmark crash.

Usage:  python scripts/memory_audit.py [--limit-gb 15.0]

Prints one JSON line per program: argument/output/temp/peak bytes. Exits
nonzero if any program's (args + temp + output) exceeds --limit-gb.
"""

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/premvos_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def analyze(name, jitted, *args, limit_gb=None):
    compiled = jitted.lower(*args).compile()
    ma = compiled.memory_analysis()
    rec = {"program": name}
    if ma is None:
        rec["memory_analysis"] = None
        print(json.dumps(rec), flush=True)
        return rec
    fields = [
        "argument_size_in_bytes",
        "output_size_in_bytes",
        "temp_size_in_bytes",
        "generated_code_size_in_bytes",
        "alias_size_in_bytes",
        "peak_memory_in_bytes",
    ]
    total = 0
    for f in fields:
        v = getattr(ma, f, None)
        if v is not None:
            rec[f] = int(v)
            if f in ("argument_size_in_bytes", "output_size_in_bytes",
                     "temp_size_in_bytes"):
                total += int(v)
    # arguments alias outputs for donated buffers; alias_size corrects the
    # double count
    total -= rec.get("alias_size_in_bytes", 0)
    # peak_memory_in_bytes is the compiler's own live-peak estimate; its
    # inclusion of argument buffers varies by backend, so take the max of
    # both accountings (conservative)
    total = max(total, rec.get("peak_memory_in_bytes") or 0)
    rec["live_total_gb"] = round(total / 2**30, 3)
    rec["ok"] = limit_gb is None or rec["live_total_gb"] <= limit_gb
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--limit-gb", type=float, default=15.0,
                    help="fail if any program needs more live HBM than this")
    ap.add_argument("--programs", nargs="*",
                    default=["refine_ft", "proposal_ft", "pipeline"])
    args = ap.parse_args()

    from premvos_tpu.config import PremvosConfig
    from premvos_tpu.finetune.fused import (
        _prep_consts,
        build_proposal_fused_runs,
        build_refine_fused_runs,
        proposal_finetune_hw,
    )
    from premvos_tpu.parallel.mesh import make_mesh
    from premvos_tpu.pipeline.runner import build_models, init_params
    from premvos_tpu.train.trainer import (
        create_train_state, replicate_state,
    )

    cfg = PremvosConfig()
    p = cfg.pipeline
    mesh = make_mesh(1)
    models = build_models(cfg)
    params = init_params(models, cfg, jax.random.PRNGKey(0))

    r = np.random.default_rng(0)
    frame0 = r.integers(0, 255, (p.image_height, p.image_width, 3)).astype(
        np.uint8
    )
    lab0 = np.zeros((p.image_height, p.image_width), np.int32)
    lab0[100:200, 150:300] = 1
    lab0[250:350, 500:650] = 2
    key = jax.random.PRNGKey(0)
    chunk = cfg.finetune.chunk

    import optax  # noqa: F401  (tx built inside the builders)

    recs = []
    if "refine_ft" in args.programs:
        runs, tx = build_refine_fused_runs(
            models.refine, mesh, (p.image_height, p.image_width),
            cfg.refine, cfg.finetune, p.max_objects,
        )
        consts = _prep_consts(frame0, lab0, mesh, p.max_objects)
        state = replicate_state(
            create_train_state(params["refine"], tx), mesh
        )
        recs.append(
            analyze(f"refine_ft_chunk{chunk}_480p", runs[chunk], state,
                    consts, key, limit_gb=args.limit_gb)
        )
    if "proposal_ft" in args.programs:
        hw = proposal_finetune_hw(
            (p.image_height, p.image_width), cfg.finetune
        )
        runs, tx = build_proposal_fused_runs(
            models.maskrcnn, cfg.proposal, mesh, hw, cfg.finetune,
            p.max_objects,
        )
        consts = _prep_consts(frame0, lab0, mesh, p.max_objects, hw=hw)
        state = replicate_state(
            create_train_state(params["maskrcnn"], tx), mesh
        )
        recs.append(
            analyze(f"proposal_ft_chunk{chunk}_{hw[0]}x{hw[1]}", runs[chunk],
                    state, consts, key, limit_gb=args.limit_gb)
        )
    if "pipeline" in args.programs:
        from premvos_tpu.pipeline.runner import run_sequence

        t = 33
        frames = jnp.zeros((t, p.image_height, p.image_width, 3), jnp.uint8)
        gt = jnp.zeros((p.max_objects, p.image_height, p.image_width),
                       jnp.float32)
        recs.append(
            analyze(f"pipeline_t{t}_480p", run_sequence, models, params,
                    cfg, frames, gt, jnp.int32(2), limit_gb=args.limit_gb)
        )

    bad = [r_ for r_ in recs if not r_.get("ok", True)]
    if bad:
        print(f"FAIL: {len(bad)} program(s) exceed {args.limit_gb} GB",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
