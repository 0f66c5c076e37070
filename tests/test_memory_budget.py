"""Production-shape HBM-footprint smoke tests (VERDICT r4 item 7).

Round 4's headline metric died on a RESOURCE_EXHAUSTED the first time the
fused per-video fine-tune compiled at the production 480p config — a
failure class the tiny-shape dryrun_multichip can never catch. These tests
lower + COMPILE (never run) the exact production fine-tune programs and
assert the compiled live-memory peak fits a single chip, so a footprint
regression fails CI on the CPU backend instead of crashing a benchmark.

The scan length is 1 (the lax.scan body is identical at any length and the
body is what holds the live intermediates); parameters are eval_shape-built
zeros (compile needs shapes/dtypes, not values). scripts/memory_audit.py is
the on-TPU twin of this test with the real backend's buffer assignment;
docs/MEMORY_BUDGET.md records its measurements.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow

# v5e-lite HBM is 16 GB; leave headroom for the runtime + fragmentation.
HBM_LIMIT_GB = 15.0


def _zeros_init(model, rng, *args):
    shapes = jax.eval_shape(model.init, rng, *args)
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def _live_gb(jitted, *args):
    ma = jitted.lower(*args).compile().memory_analysis()
    if ma is None:
        pytest.skip("backend reports no compiled memory analysis")
    total = (
        ma.argument_size_in_bytes
        + ma.output_size_in_bytes
        + ma.temp_size_in_bytes
        - ma.alias_size_in_bytes
    )
    total = max(total, getattr(ma, "peak_memory_in_bytes", 0) or 0)
    return total / 2**30


def _production_setup():
    from premvos_tpu.config import PremvosConfig
    from premvos_tpu.parallel.mesh import make_mesh
    from premvos_tpu.pipeline.runner import build_models

    cfg = PremvosConfig()
    p = cfg.pipeline
    mesh = make_mesh(1)
    models = build_models(cfg)
    frame0 = np.zeros((p.image_height, p.image_width, 3), np.uint8)
    frame0[:] = 127
    lab0 = np.zeros((p.image_height, p.image_width), np.int32)
    lab0[100:200, 150:300] = 1
    lab0[250:350, 500:650] = 2
    bg = np.full_like(frame0, 127)  # skip the cv2 inpaint — values don't
    #                                 matter for a compile-only check
    return cfg, mesh, models, frame0, lab0, bg


def test_refine_finetune_fits_hbm_at_480p():
    import dataclasses

    from premvos_tpu.finetune.fused import (
        _prep_consts, build_refine_fused_runs,
    )
    from premvos_tpu.train.trainer import create_train_state, replicate_state

    cfg, mesh, models, frame0, lab0, bg = _production_setup()
    p = cfg.pipeline
    ft = dataclasses.replace(cfg.finetune, chunk=1, steps=1)
    runs, tx = build_refine_fused_runs(
        models.refine, mesh, (p.image_height, p.image_width), cfg.refine,
        ft, p.max_objects,
    )
    params = _zeros_init(
        models.refine, jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.refine.crop_size, cfg.refine.crop_size, 4)),
    )
    consts = _prep_consts(frame0, lab0, mesh, p.max_objects, background=bg)
    state = replicate_state(create_train_state(params, tx), mesh)
    gb = _live_gb(runs[1], state, consts, jax.random.PRNGKey(0))
    assert gb <= HBM_LIMIT_GB, (
        f"fused refine fine-tune needs {gb:.2f} GB live at 480p "
        f"(limit {HBM_LIMIT_GB}) — the round-4 OOM class is back; see "
        "docs/MEMORY_BUDGET.md"
    )


def test_proposal_finetune_fits_hbm_at_production_scale():
    import dataclasses

    from premvos_tpu.finetune.fused import (
        _prep_consts, build_proposal_fused_runs, proposal_finetune_hw,
    )
    from premvos_tpu.pipeline.runner import get_anchors
    from premvos_tpu.train.trainer import create_train_state, replicate_state

    cfg, mesh, models, frame0, lab0, bg = _production_setup()
    p = cfg.pipeline
    ft = dataclasses.replace(cfg.finetune, chunk=1, steps=1)
    hw = proposal_finetune_hw((p.image_height, p.image_width), ft)
    runs, tx = build_proposal_fused_runs(
        models.maskrcnn, cfg.proposal, mesh, hw, ft, p.max_objects,
    )
    params = _zeros_init(
        models.maskrcnn, jax.random.PRNGKey(0),
        jnp.zeros((1, p.image_height, p.image_width, 3), jnp.float32),
        get_anchors(cfg),
    )
    consts = _prep_consts(
        frame0, lab0, mesh, p.max_objects, background=bg, hw=hw
    )
    state = replicate_state(create_train_state(params, tx), mesh)
    gb = _live_gb(runs[1], state, consts, jax.random.PRNGKey(0))
    assert gb <= HBM_LIMIT_GB, (
        f"fused proposal fine-tune needs {gb:.2f} GB live at {hw} "
        f"(limit {HBM_LIMIT_GB}) — see docs/MEMORY_BUDGET.md"
    )
