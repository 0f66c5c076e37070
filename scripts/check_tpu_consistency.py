"""TPU-vs-CPU consistency check for the fused pipeline (tiny config).

Runs the same tiny pipeline with identical fp32 params/inputs on the TPU
backend and on the CPU backend, then compares tracked label maps. Exact
equality is not expected (conv algorithms differ across backends; the merge
stage thresholds/argmaxes can flip near-tie pixels), so the check reports
label agreement and fails below a threshold.

Usage:  python scripts/check_tpu_consistency.py
"""

import sys

import numpy as np


def run_on(platform: str):
    import jax

    jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp

    # Re-import inside the chosen backend context.
    from premvos_tpu.config import (
        FlowConfig,
        PipelineConfig,
        PremvosConfig,
        ProposalConfig,
        RefineConfig,
        ReIDConfig,
    )
    from premvos_tpu.pipeline.runner import build_models, init_params, run_sequence

    cfg = PremvosConfig(
        proposal=ProposalConfig(
            backbone_depth=50, fpn_channels=32, rpn_pre_nms_topk=32,
            rpn_post_nms_topk=8, detections_per_frame=4,
        ),
        refine=RefineConfig(crop_size=33, backbone_depth=50),
        flow=FlowConfig(variant="flownetc", max_displacement=4,
                        infer_height=64, infer_width=64),
        reid=ReIDConfig(backbone_depth=50, embedding_dim=8, crop_size=32),
        pipeline=PipelineConfig(image_height=64, image_width=64,
                                max_objects=2, max_proposals=4,
                                dtype="float32"),
    )
    models = build_models(cfg)
    params = init_params(models, cfg, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (3, 64, 64, 3)), jnp.uint8)
    gt = np.zeros((2, 64, 64), np.float32)
    gt[0, 10:20, 10:20] = 1.0
    gt[1, 40:50, 40:50] = 1.0
    labels = run_sequence(models, params, cfg, frames, jnp.asarray(gt), 2)
    return np.asarray(labels)


def main():
    import jax

    tpu_available = any(d.platform != "cpu" for d in jax.devices())
    if not tpu_available:
        print("SKIP: no accelerator backend available")
        return 0

    lab_tpu = run_on(jax.default_backend())
    lab_cpu = run_on("cpu")

    agree = float((lab_tpu == lab_cpu).mean())
    fg_either = np.logical_or(lab_tpu > 0, lab_cpu > 0)
    fg_agree = (
        float((lab_tpu == lab_cpu)[fg_either].mean()) if fg_either.any() else 1.0
    )
    print(f"label agreement: {agree:.4f}  (foreground-region: {fg_agree:.4f})")
    if agree < 0.97:
        print("FAIL: backends diverge beyond tolerance")
        return 1
    print("PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
