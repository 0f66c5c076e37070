"""Parity: Pallas RoIAlign vs the gather reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from premvos_tpu.ops.pallas.roi_align_pallas import roi_align_pallas
from premvos_tpu.ops.roi_align import roi_align_reference


def test_pallas_roi_align_matches_reference(rng):
    feat = jnp.array(rng.standard_normal((24, 32, 16)), jnp.float32)
    boxes = jnp.array(
        [[2.0, 3.0, 20.0, 18.0], [0.0, 0.0, 31.0, 23.0],
         [5.5, 7.25, 9.5, 12.75], [1.0, 1.0, 30.0, 20.0]],
        jnp.float32,
    )
    want = np.asarray(roi_align_reference(feat, boxes, 7, 2))
    got = np.asarray(
        roi_align_pallas(
            feat, boxes, 7, 2, roi_block=2, channel_block=16, interpret=True
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pallas_roi_align_spatial_scale_and_padding(rng):
    feat = jnp.array(rng.standard_normal((16, 16, 8)), jnp.float32)
    boxes = jnp.array([[8.0, 8.0, 56.0, 56.0], [0.0, 0.0, 64.0, 64.0],
                       [4.0, 4.0, 20.0, 20.0]], jnp.float32)
    want = np.asarray(roi_align_reference(feat, boxes, 5, 2, spatial_scale=0.25))
    got = np.asarray(
        roi_align_pallas(
            feat, boxes, 5, 2, spatial_scale=0.25,
            roi_block=2, channel_block=8, interpret=True,  # 3 rois pad to 4
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pallas_roi_align_degenerate_boxes(rng):
    feat = jnp.array(rng.standard_normal((16, 16, 8)), jnp.float32)
    boxes = jnp.zeros((2, 4), jnp.float32)
    got = np.asarray(
        roi_align_pallas(feat, boxes, 7, 2, roi_block=2, channel_block=8,
                         interpret=True)
    )
    assert np.isfinite(got).all()
