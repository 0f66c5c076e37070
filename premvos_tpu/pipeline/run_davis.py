"""CLI: run the fused pipeline over a DAVIS dataset (SURVEY.md L5).

Reference orchestration is shell scripts chaining five processes through the
filesystem; here one command tracks every sequence, optionally per-video
fine-tunes the refinement net first, dumps DAVIS-palette PNGs and reports
in-repo J&F + throughput.

  python -m premvos_tpu.pipeline.run_davis --davis_root /data/DAVIS \
      --output /tmp/results [--sequences dog cows] [--finetune] \
      [--checkpoint /path/to/params] [--max_frames N]
"""

from __future__ import annotations

import argparse
import json
import os
import time

# Persistent XLA compile cache like every other entry point (bench.py,
# scripts/*): without it each cold process pays the full multi-minute
# compile of the fused pipeline + finetune programs (ADVICE r4).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/premvos_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from premvos_tpu.config import PremvosConfig
from premvos_tpu.data.davis import DavisDataset, crop_result, save_results
from premvos_tpu.eval.davis_eval import evaluate_dataset, evaluate_sequence
from premvos_tpu.parallel.mesh import make_mesh
from premvos_tpu.pipeline.runner import build_models, init_params, run_sequence
from premvos_tpu.utils.logging import get_logger


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--davis_root", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--split", default="val")
    ap.add_argument("--sequences", nargs="*", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--finetune", action="store_true")
    ap.add_argument("--max_frames", type=int, default=None)
    ap.add_argument("--config", default=None, help="JSON config preset")
    ap.add_argument(
        "--profile_dir", default=None,
        help="capture a jax.profiler trace of the first tracked sequence "
        "(view with TensorBoard/XProf)",
    )
    ap.add_argument(
        "--resume", action="store_true",
        help="skip sequences whose output dir already has every frame "
        "(sequence-level resume — the TPU analogue of the reference's "
        "stage-outputs-on-disk restart)",
    )
    args = ap.parse_args(argv)

    log = get_logger()
    if args.config:
        from premvos_tpu.config import load_config

        cfg = load_config(args.config)
    else:
        cfg = PremvosConfig()
    p = cfg.pipeline
    models = build_models(cfg)
    params = init_params(models, cfg, jax.random.PRNGKey(0))
    if args.checkpoint:
        from premvos_tpu.utils.checkpoint import load_params

        params = load_params(args.checkpoint, like=params)
        log.info("loaded checkpoint %s", args.checkpoint)

    ds = DavisDataset(args.davis_root, split=args.split)
    seqs = args.sequences or ds.sequences
    mesh = make_mesh()

    if args.resume:
        from pathlib import Path

        remaining = []
        for name in seqs:
            done = Path(args.output) / name
            n_frames = len(ds.frame_paths(name))
            if args.max_frames:
                n_frames = min(n_frames, args.max_frames)
            if done.exists() and len(list(done.glob("*.png"))) >= n_frames:
                log.info("resume: skipping completed %s", name)
            else:
                remaining.append(name)
        seqs = remaining

    from premvos_tpu.data.prefetch import prefetch_sequences

    # One fused-finetune build serves every sequence (all resized to the
    # pipeline canvas): avoids per-video retrace+recompile (ADVICE r4).
    ft_built = None
    if args.finetune and cfg.finetune.method == "fused":
        from premvos_tpu.finetune.fused import build_fused_runner

        ft_built = build_fused_runner(models, cfg, mesh)

    results, total_frames, total_time = [], 0, 0.0
    for name, seq in prefetch_sequences(
        ds, seqs, p.image_height, p.image_width, p.max_objects, args.max_frames
    ):
        seq_params = params
        if args.finetune:
            from premvos_tpu.finetune.fused import finetune_video

            first_lab = (
                seq["gt_labels"][0]
                if len(seq["gt_labels"])
                else np.zeros(seq["frames"].shape[1:3], np.int32)
            )
            frame0 = np.asarray(seq["frames"][0])
            t0 = time.perf_counter()
            # FinetuneConfig.method dispatch: fused on-device augmentation
            # + scanned train steps (default) or the host-pool oracle.
            seq_params, losses = finetune_video(
                models, params, frame0, first_lab, mesh, cfg, built=ft_built,
            )
            log.info(
                "finetuned %s in %.1fs (refine %.4f, proposal %.4f)",
                name, time.perf_counter() - t0,
                losses["refine"], losses["proposal"],
            )

        profiling = args.profile_dir and not results and total_frames == 0
        if profiling:
            jax.profiler.start_trace(args.profile_dir)
        t0 = time.perf_counter()
        labels = run_sequence(
            models, seq_params, cfg,
            jnp.asarray(seq["frames"]), jnp.asarray(seq["gt_masks"]),
            jnp.int32(seq["num_objects"]),
            jnp.asarray(seq["intro_frames"]),
        )
        labels = np.asarray(jax.block_until_ready(labels))
        dt = time.perf_counter() - t0
        if profiling:
            jax.profiler.stop_trace()
            log.info("profiler trace written to %s", args.profile_dir)
        total_frames += labels.shape[0] - 1
        total_time += dt
        log.info("%s: %d frames in %.2fs (%.2f fps)",
                 name, labels.shape[0], dt, (labels.shape[0] - 1) / dt)

        out = crop_result(labels, seq["orig_hw"])
        frame_names = [f.stem + ".png" for f in ds.frame_paths(name)]
        save_results(args.output, name, out, frame_names[: len(out)])

        if len(seq["gt_labels"]) == len(labels):
            r = evaluate_sequence(labels, seq["gt_labels"], seq["num_objects"])
            r["name"] = name
            results.append(r)
            log.info("%s: J=%.3f F=%.3f", name, r["J"], r["F"])

    summary = {"frames": total_frames, "seconds": total_time,
               "fps": total_frames / max(total_time, 1e-9)}
    if results:
        summary.update(evaluate_dataset(results))
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
