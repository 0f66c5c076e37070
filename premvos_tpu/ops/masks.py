"""Dense mask operations.

The reference keeps masks as COCO RLE strings on disk and uses
`pycocotools.mask` (Cython/C) for decode/encode/IoU, plus a per-proposal
"paste 28×28 mask into the full image" step on CPU (MaskRCNN eval path,
unverified — reference mount was empty; see SURVEY.md C11). TPU-native
design: masks stay *dense* in HBM end-to-end — soft [H, W] float arrays with
fixed padded object/proposal counts — so IoU is a batched reduction and paste
is a bilinear resample. RLE exists only at the I/O edge (io_compat.rle).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mask_iou(
    a: jnp.ndarray, b: jnp.ndarray, threshold: float = 0.5
) -> jnp.ndarray:
    """IoU matrix between [N, H, W] and [M, H, W] (soft) masks → [N, M].

    Masks are binarized at `threshold` first (pass 0 to treat inputs as
    already-binary {0,1} floats).
    """
    ab = (a > threshold).astype(jnp.float32) if threshold else a
    bb = (b > threshold).astype(jnp.float32) if threshold else b
    af = ab.reshape(ab.shape[0], -1)
    bf = bb.reshape(bb.shape[0], -1)
    inter = af @ bf.T  # MXU
    union = af.sum(-1)[:, None] + bf.sum(-1)[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 0.0)


def soft_mask_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Soft IoU (no binarization): Σmin / Σmax over pixels, [N,H,W]×[M,H,W]→[N,M].

    Used by the merge stage where proposals carry soft refined masks; avoids
    a hard threshold inside the jitted tracker.
    """
    inter = jnp.einsum("nhw,mhw->nm", a, b)
    sa = a.reshape(a.shape[0], -1).sum(-1)
    sb = b.reshape(b.shape[0], -1).sum(-1)
    union = sa[:, None] + sb[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-6), 0.0)


def paste_mask(
    mask: jnp.ndarray,
    box: jnp.ndarray,
    height: int,
    width: int,
    precision=None,
) -> jnp.ndarray:
    """Paste an [M, M] mask predicted for xyxy `box` into an [height, width]
    canvas (bilinear, zero outside the box).

    Inverse of RoIAlign's crop: image pixel (y, x) samples the mask at
    ((y + .5 − y1) / bh · M − .5, (x + .5 − x1) / bw · M − .5).
    Batched use: `jax.vmap(paste_mask, in_axes=(0, 0, None, None))`.
    """
    m = mask.shape[0]
    x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
    bw = jnp.maximum(x2 - x1, 1e-6)
    bh = jnp.maximum(y2 - y1, 1e-6)

    yy = jnp.arange(height, dtype=mask.dtype)[:, None]
    xx = jnp.arange(width, dtype=mask.dtype)[None, :]
    my = (yy + 0.5 - y1) / bh * m - 0.5  # [H, 1]
    mx = (xx + 0.5 - x1) / bw * m - 0.5  # [1, W]

    def lin(c, size):
        inside = jnp.logical_and(c > -0.5, c < size - 0.5)
        cc = jnp.clip(c, 0.0, size - 1.0)
        i0 = jnp.floor(cc).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, size - 1)
        w1 = cc - i0.astype(mask.dtype)
        return i0, i1, jnp.where(inside, 1.0 - w1, 0.0), jnp.where(inside, w1, 0.0)

    y0, y1i, wy0, wy1 = lin(my, m)
    x0, x1i, wx0, wx1 = lin(mx, m)

    # Separable bilinear paste as two small matmuls (MXU-friendly).
    eye = jnp.eye(m, dtype=mask.dtype)
    wy = eye[y0[:, 0]] * wy0 + eye[y1i[:, 0]] * wy1  # [H, M]
    wx = eye[x0[0, :]] * wx0[0, :, None] + eye[x1i[0, :]] * wx1[0, :, None]  # [W, M]
    # fp32 matmuls by default: bilinear paste weights at bf16 shift mask
    # boundaries sub-pixel. Perf presets pass a lower precision (measured
    # J&F impact recorded in docs/SYNTHETIC_BENCHMARK.json).
    hi = jax.lax.Precision.HIGHEST if precision is None else precision
    return jnp.matmul(jnp.matmul(wy, mask, precision=hi), wx.T, precision=hi)
