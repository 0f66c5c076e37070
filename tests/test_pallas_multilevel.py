"""Parity: fused multilevel Pallas RoIAlign vs the compute-all-and-select
XLA path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from premvos_tpu.models.maskrcnn import multilevel_roi_align, roi_levels
from premvos_tpu.ops.pallas.multilevel_roi_align_pallas import (
    multilevel_roi_align_pallas,
)


def test_fused_multilevel_matches_xla(rng):
    c = 16
    feats = {
        "P2": jnp.array(rng.standard_normal((32, 48, c)), jnp.float32),
        "P3": jnp.array(rng.standard_normal((16, 24, c)), jnp.float32),
        "P4": jnp.array(rng.standard_normal((8, 12, c)), jnp.float32),
        "P5": jnp.array(rng.standard_normal((4, 6, c)), jnp.float32),
    }
    boxes = jnp.array(
        [
            [4.0, 4.0, 40.0, 40.0],     # small → P2
            [0.0, 0.0, 120.0, 120.0],   # → P3
            [0.0, 0.0, 190.0, 190.0],   # canonical-ish → P4
            [0.0, 0.0, 500.0, 380.0],   # huge → P5
        ],
        jnp.float32,
    )
    want = np.asarray(multilevel_roi_align(feats, boxes, 7, 2))
    got = np.asarray(
        multilevel_roi_align_pallas(
            feats["P2"], feats["P3"], feats["P4"], feats["P5"],
            boxes, roi_levels(boxes), 7, 2,
            roi_block=2, channel_block=16, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_multilevel_random_mix_unsorted(rng):
    """Shuffled levels + a partial tail block exercise the level sort, the
    per-block count skip, and the inverse permutation."""
    c = 24
    feats = {
        "P2": jnp.array(rng.standard_normal((32, 48, c)), jnp.float32),
        "P3": jnp.array(rng.standard_normal((16, 24, c)), jnp.float32),
        "P4": jnp.array(rng.standard_normal((8, 12, c)), jnp.float32),
        "P5": jnp.array(rng.standard_normal((4, 6, c)), jnp.float32),
    }
    n = 13  # not a multiple of roi_block=4 → padded tail block
    sizes = rng.uniform(8.0, 400.0, (n,))
    cx = rng.uniform(0, 190, (n,))
    cy = rng.uniform(0, 120, (n,))
    boxes = jnp.array(
        np.stack([cx - sizes / 2, cy - sizes / 2, cx + sizes / 2, cy + sizes / 2], 1),
        jnp.float32,
    )
    lv = roi_levels(boxes)
    assert len(np.unique(np.asarray(lv))) >= 3  # a real level mix
    want = np.asarray(multilevel_roi_align(feats, boxes, 7, 2))
    got = np.asarray(
        multilevel_roi_align_pallas(
            feats["P2"], feats["P3"], feats["P4"], feats["P5"],
            boxes, lv, 7, 2, roi_block=4, channel_block=8, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_multilevel_degenerate(rng):
    c = 8
    feats = [
        jnp.array(rng.standard_normal((16, 16, c)), jnp.float32),
        jnp.array(rng.standard_normal((8, 8, c)), jnp.float32),
        jnp.array(rng.standard_normal((4, 4, c)), jnp.float32),
        jnp.array(rng.standard_normal((2, 2, c)), jnp.float32),
    ]
    boxes = jnp.zeros((3, 4), jnp.float32)
    levels = jnp.full((3,), 2, jnp.int32)
    got = np.asarray(
        multilevel_roi_align_pallas(
            *feats, boxes, levels, 7, 2, roi_block=3, channel_block=8,
            interpret=True,
        )
    )
    assert got.shape == (3, 7, 7, c)
    assert np.isfinite(got).all()
