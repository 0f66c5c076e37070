import jax.numpy as jnp
import numpy as np

from premvos_tpu.ops.roi_align import (
    crop_and_resize,
    roi_align_matmul,
    roi_align_reference,
)


def test_matmul_matches_gather(rng):
    feat = rng.standard_normal((24, 32, 8)).astype(np.float32)
    boxes = np.array(
        [[2.0, 3.0, 20.0, 18.0], [0.0, 0.0, 31.0, 23.0], [5.5, 7.25, 9.5, 12.75]],
        np.float32,
    )
    a = roi_align_reference(jnp.array(feat), jnp.array(boxes), 7, 2)
    b = roi_align_matmul(jnp.array(feat), jnp.array(boxes), 7, 2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_constant_feature_gives_constant_output(rng):
    feat = np.full((16, 16, 4), 3.25, np.float32)
    boxes = np.array([[1.0, 1.0, 14.0, 14.0]], np.float32)
    out = roi_align_reference(jnp.array(feat), jnp.array(boxes), 5, 2)
    np.testing.assert_allclose(np.asarray(out), 3.25, rtol=1e-6)


def test_spatial_scale(rng):
    feat = rng.standard_normal((16, 16, 4)).astype(np.float32)
    boxes = np.array([[8.0, 8.0, 56.0, 56.0]], np.float32)  # image coords
    a = roi_align_reference(jnp.array(feat), jnp.array(boxes), 7, 2, spatial_scale=0.25)
    b = roi_align_reference(jnp.array(feat), jnp.array(boxes) * 0.25, 7, 2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_crop_and_resize_identity():
    # Cropping the whole image at crop_size == image size is the identity.
    img = np.arange(8 * 8 * 2, dtype=np.float32).reshape(8, 8, 2)
    boxes = np.array([[0.0, 0.0, 1.0, 1.0]], np.float32)
    out = crop_and_resize(jnp.array(img), jnp.array(boxes), 8)
    np.testing.assert_allclose(np.asarray(out)[0], img, rtol=1e-5)


def test_crop_and_resize_linear_ramp():
    # Bilinear resampling of a linear ramp is exact.
    h, w = 10, 10
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = (2 * xx + 3 * yy)[..., None]
    boxes = np.array([[0.2, 0.1, 0.8, 0.9]], np.float32)  # y1 x1 y2 x2 normalized
    p = 5
    out = np.asarray(crop_and_resize(jnp.array(img), jnp.array(boxes), p))[0, :, :, 0]
    t = np.arange(p) / (p - 1)
    ys = (0.2 + t * 0.6) * (h - 1)
    xs = (0.1 + t * 0.8) * (w - 1)
    expect = 2 * xs[None, :] + 3 * ys[:, None]
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)
