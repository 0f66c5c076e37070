"""RoIAlign: fixed-count region feature extraction.

Reference: the Mask R-CNN stage calls `tf.image.crop_and_resize` (a TF C++/
CUDA op) from its `roi_align()` wrapper (MaskRCNN/model.py, unverified —
reference mount was empty; see SURVEY.md). We provide:

  * `roi_align_reference` — gather-based bilinear sampling, Detectron-style
    `aligned=True` half-pixel semantics with a sampling grid per bin. Pure
    jnp; jit/vmap-safe; used for parity tests and as the general fallback.
  * `roi_align_matmul` — the TPU-native formulation: bilinear interpolation is
    separable, so each RoI's crop is two small dense matmuls
    (Wy @ feature @ Wxᵀ) that run on the MXU instead of the gather unit.
  * `crop_and_resize` — exact `tf.image.crop_and_resize` semantics for
    golden-parity tests against the reference's op.

All functions take a *fixed* number of boxes; invalid boxes should be
degenerate (zeros) and masked downstream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Interpolation matmuls run in fp32: at TPU-default bf16 matmul precision the
# bilinear weights lose ~1e-3, which visibly shifts mask boundaries. These
# matmuls are tiny next to the backbone, so HIGHEST costs nothing.
_INTERP_PRECISION = jax.lax.Precision.HIGHEST


def _bilinear_1d(coords: jnp.ndarray, size: int):
    """1-D bilinear gather indices+weights with edge clamping.

    coords: [...] continuous pixel coordinates.
    Returns (i0, i1, w0, w1); samples farther than 1px outside are zeroed
    (matches the ROIAlign convention of ignoring out-of-image samples).
    """
    inside = jnp.logical_and(coords > -1.0, coords < size)
    c = jnp.clip(coords, 0.0, size - 1)
    i0 = jnp.floor(c).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, size - 1)
    w1 = c - i0.astype(c.dtype)
    w0 = 1.0 - w1
    w0 = jnp.where(inside, w0, 0.0)
    w1 = jnp.where(inside, w1, 0.0)
    return i0, i1, w0, w1


def roi_align_reference(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    output_size: int = 7,
    sampling_ratio: int = 2,
    spatial_scale: float = 1.0,
) -> jnp.ndarray:
    """Gather-based RoIAlign.

    Args:
      features: [H, W, C].
      boxes: [N, 4] xyxy in *image* coordinates (scaled by spatial_scale).
      output_size: P (output is P×P).
      sampling_ratio: s sample points per bin per axis.
      spatial_scale: feature stride reciprocal.

    Returns [N, P, P, C].
    """
    h, w, _ = features.shape
    p, s = output_size, sampling_ratio
    b = boxes * spatial_scale

    # aligned=True: half-pixel offset.
    x1, y1, x2, y2 = b[:, 0] - 0.5, b[:, 1] - 0.5, b[:, 2] - 0.5, b[:, 3] - 0.5
    bw = jnp.maximum(x2 - x1, 1e-6)
    bh = jnp.maximum(y2 - y1, 1e-6)

    # Sample-point grid: p*s points per axis, centered in sub-bins.
    grid = (jnp.arange(p * s, dtype=features.dtype) + 0.5) / (p * s)
    ys = y1[:, None] + grid[None, :] * bh[:, None]  # [N, p*s]
    xs = x1[:, None] + grid[None, :] * bw[:, None]

    yi0, yi1, yw0, yw1 = _bilinear_1d(ys, h)
    xi0, xi1, xw0, xw1 = _bilinear_1d(xs, w)

    def one_roi(yi0, yi1, yw0, yw1, xi0, xi1, xw0, xw1):
        # [p*s, p*s, C] via 4-corner gather.
        f00 = features[yi0[:, None], xi0[None, :]]
        f01 = features[yi0[:, None], xi1[None, :]]
        f10 = features[yi1[:, None], xi0[None, :]]
        f11 = features[yi1[:, None], xi1[None, :]]
        wy0, wy1 = yw0[:, None, None], yw1[:, None, None]
        wx0, wx1 = xw0[None, :, None], xw1[None, :, None]
        out = (
            f00 * wy0 * wx0
            + f01 * wy0 * wx1
            + f10 * wy1 * wx0
            + f11 * wy1 * wx1
        )
        # Average the s×s samples in each bin.
        out = out.reshape(p, s, p, s, -1).mean(axis=(1, 3))
        return out

    return jax.vmap(one_roi)(yi0, yi1, yw0, yw1, xi0, xi1, xw0, xw1)


def _interp_matrix(coords: jnp.ndarray, size: int, dtype) -> jnp.ndarray:
    """Dense 1-D interpolation matrix W with W[k, i] = weight of src i for
    sample k. coords: [N, K] → [N, K, size]."""
    i0, i1, w0, w1 = _bilinear_1d(coords, size)
    eye = jnp.eye(size, dtype=dtype)
    return eye[i0] * w0[..., None] + eye[i1] * w1[..., None]


def roi_align_matmul(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    output_size: int = 7,
    sampling_ratio: int = 2,
    spatial_scale: float = 1.0,
) -> jnp.ndarray:
    """MXU formulation of RoIAlign: out = pool(Wy @ F @ Wxᵀ) per RoI.

    Identical math to `roi_align_reference` (bilinear interp is separable),
    but expressed as dense matmuls so XLA tiles it onto the systolic array —
    on TPU, gathers serialize on the scalar/vector path while these matmuls
    stream. Prefer this on TPU for moderate feature sizes (FPN levels).
    """
    h, w, _ = features.shape
    p, s = output_size, sampling_ratio
    b = boxes * spatial_scale
    x1, y1 = b[:, 0] - 0.5, b[:, 1] - 0.5
    bw = jnp.maximum(b[:, 2] - 0.5 - x1, 1e-6)
    bh = jnp.maximum(b[:, 3] - 0.5 - y1, 1e-6)

    grid = (jnp.arange(p * s, dtype=features.dtype) + 0.5) / (p * s)
    ys = y1[:, None] + grid[None, :] * bh[:, None]
    xs = x1[:, None] + grid[None, :] * bw[:, None]

    wy = _interp_matrix(ys, h, features.dtype)  # [N, p*s, H]
    wx = _interp_matrix(xs, w, features.dtype)  # [N, p*s, W]

    # [N, p*s, H] @ [H, W*C] → [N, p*s, W, C] → @ Wx → [N, p*s, p*s, C]
    tmp = jnp.einsum("nkh,hwc->nkwc", wy, features, precision=_INTERP_PRECISION)
    out = jnp.einsum("nqw,nkwc->nkqc", wx, tmp, precision=_INTERP_PRECISION)
    return out.reshape(boxes.shape[0], p, s, p, s, -1).mean(axis=(2, 4))


def crop_and_resize(
    image: jnp.ndarray, boxes: jnp.ndarray, crop_size: int, precision=None
) -> jnp.ndarray:
    """Exact `tf.image.crop_and_resize` bilinear semantics (the reference's
    RoIAlign primitive). boxes are [N, 4] *normalized* [y1, x1, y2, x2];
    sample k of P maps to y1*(H−1) + k/(P−1)*(y2−y1)*(H−1). Out-of-range
    samples are 0 (extrapolation_value=0).

    precision: matmul precision for the interpolation einsums (default
    HIGHEST = full fp32, the parity setting; these are ~30 GFLOP/frame at
    refinement scale, so perf presets pass DEFAULT — bf16 weight error
    ≈0.4 %, below the 1/255 image quantization)."""
    h, w, _ = image.shape
    p = crop_size
    prec = _INTERP_PRECISION if precision is None else precision
    y1, x1, y2, x2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    if p > 1:
        t = jnp.arange(p, dtype=image.dtype) / (p - 1)
    else:
        t = jnp.full((1,), 0.5, image.dtype)
    ys = (y1[:, None] + t[None, :] * (y2 - y1)[:, None]) * (h - 1)
    xs = (x1[:, None] + t[None, :] * (x2 - x1)[:, None]) * (w - 1)

    wy = _interp_matrix(ys, h, image.dtype)
    wx = _interp_matrix(xs, w, image.dtype)
    tmp = jnp.einsum("nkh,hwc->nkwc", wy, image, precision=prec)
    return jnp.einsum("nqw,nkwc->nkqc", wx, tmp, precision=prec)


def roi_align(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    output_size: int = 7,
    sampling_ratio: int = 2,
    spatial_scale: float = 1.0,
) -> jnp.ndarray:
    """Default entry point: MXU matmul formulation (TPU-native hot path)."""
    return roi_align_matmul(
        features, boxes, output_size, sampling_ratio, spatial_scale
    )
