"""End-to-end smoke: synthetic DAVIS tree → CLI runner → PNGs + J&F report.

Exercises reader → fused pipeline → palette dump → in-repo evaluation in one
shot, on the tiny config (random weights; asserts contract, not accuracy).
"""

import dataclasses
import json

import numpy as np
import pytest

from premvos_tpu.config import save_config
from premvos_tpu.data.davis import make_synthetic_davis
from premvos_tpu.data.palette import load_indexed_png


pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_cfg_path(tmp_path_factory):
    from tests.test_pipeline import TINY

    p = tmp_path_factory.mktemp("cfg") / "tiny.json"
    save_config(p, TINY)
    return p


def test_run_davis_cli(tmp_path, tiny_cfg_path):
    from premvos_tpu.pipeline import run_davis

    root = make_synthetic_davis(tmp_path / "davis", t=3, hw=(64, 64))
    out = tmp_path / "results"
    summary = run_davis.main(
        [
            "--davis_root", str(root),
            "--output", str(out),
            "--config", str(tiny_cfg_path),
        ]
    )
    assert summary["frames"] == 2
    assert "J&F" in summary and 0.0 <= summary["J&F"] <= 1.0
    # palette PNGs dumped per frame at original resolution
    png = load_indexed_png(out / "seq_a" / "00000.png")
    assert png.shape == (64, 64)
    # frame 0 = GT annotation
    gt0 = load_indexed_png(root / "Annotations" / "480p" / "seq_a" / "00000.png")
    np.testing.assert_array_equal(png, gt0)


def test_config_json_roundtrip(tmp_path):
    from premvos_tpu.config import PremvosConfig, load_config, save_config
    from tests.test_pipeline import TINY

    p = tmp_path / "c.json"
    save_config(p, TINY)
    cfg = load_config(p)
    assert cfg == TINY
    # partial configs fill from defaults
    (tmp_path / "partial.json").write_text(
        json.dumps({"merge": {"w_reid": 2.5}})
    )
    cfg2 = load_config(tmp_path / "partial.json")
    assert cfg2.merge.w_reid == 2.5
    assert cfg2.proposal == PremvosConfig().proposal


def test_finetune_refine_decreases_loss(tmp_path):
    import jax

    from premvos_tpu.config import FinetuneConfig, RefineConfig
    from premvos_tpu.finetune.finetune import finetune_refine
    from premvos_tpu.models.deeplab import DeepLabV3Plus
    from premvos_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    cfg = RefineConfig(crop_size=33, backbone_depth=26, box_margin=6.0)
    model = DeepLabV3Plus(cfg=cfg)
    params = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 33, 33, 4), np.float32)
    )
    frame = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    labels = np.zeros((64, 64), np.int32)
    labels[20:40, 20:40] = 1
    mesh = make_mesh(2)
    ft = FinetuneConfig(num_augmentations=8, steps=6, batch_size=4,
                        learning_rate=1e-3)
    new_params, loss = finetune_refine(
        model, params, frame, labels, mesh, cfg, ft
    )
    assert np.isfinite(loss)
    # parameters actually moved
    diff = jax.tree.map(
        lambda a, b: float(abs(np.asarray(a) - np.asarray(b)).max()),
        params, new_params,
    )
    assert max(jax.tree.leaves(diff)) > 0


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from premvos_tpu.utils.checkpoint import load_params, save_params

    params = {"a": {"w": jnp.arange(6.0).reshape(2, 3)}, "b": jnp.ones(4)}
    save_params(tmp_path / "ckpt", params)
    back = load_params(tmp_path / "ckpt", like=params)
    np.testing.assert_array_equal(np.asarray(back["a"]["w"]),
                                  np.asarray(params["a"]["w"]))
    np.testing.assert_array_equal(np.asarray(back["b"]), np.ones(4))


def test_finetune_shared_pool(tmp_path):
    """One prebuilt lucid pool must serve finetune_refine unchanged —
    passing pool= skips host augmentation and trains identically."""
    import jax

    from premvos_tpu.config import FinetuneConfig, RefineConfig
    from premvos_tpu.finetune.finetune import build_lucid_pool, finetune_refine
    from premvos_tpu.models.deeplab import DeepLabV3Plus
    from premvos_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    cfg = RefineConfig(crop_size=33, backbone_depth=26, box_margin=6.0)
    model = DeepLabV3Plus(cfg=cfg)
    params = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 33, 33, 4), np.float32)
    )
    frame = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    labels = np.zeros((64, 64), np.int32)
    labels[20:40, 20:40] = 1
    mesh = make_mesh(2)
    ft = FinetuneConfig(num_augmentations=8, steps=4, batch_size=4,
                        learning_rate=1e-3)
    pool = build_lucid_pool(frame, labels, ft)
    assert len(pool[0]) == 8 and len(pool[1]) == 8
    new_params, loss = finetune_refine(
        model, params, frame, labels, mesh, cfg, ft, pool=pool
    )
    assert np.isfinite(loss)
    diff = jax.tree.map(
        lambda a, b: float(abs(np.asarray(a) - np.asarray(b)).max()),
        params, new_params,
    )
    assert max(jax.tree.leaves(diff)) > 0
