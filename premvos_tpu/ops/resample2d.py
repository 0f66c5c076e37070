"""Resample2d: bilinear warping of images/features by a flow field.

Reference: the CUDA `resample2d_package` in the flownet2 fork
(optical_flow_net/networks/resample2d_package/, unverified — reference mount
was empty; see SURVEY.md). Used inside FlowNet2 to warp the second image by
intermediate flow estimates, and its semantics are reused by the merge stage
to warp the previous frame's masks for the propagation score.

  out[y, x, c] = bilinear_sample(src, y + flow[y, x, 1], x + flow[y, x, 0], c)

flow channel 0 is u (x-displacement), channel 1 is v (y-displacement) —
the Middlebury `.flo` convention. Out-of-image samples clamp to the edge
(matching the CUDA kernel's boundary clamp).

TPU note: this is a pure gather; XLA lowers it to dynamic-gather ops. For the
mask-warping hot path the merge stage calls this vmapped over objects with
masks kept in HBM.
"""

from __future__ import annotations

import jax.numpy as jnp


def resample2d(src: jnp.ndarray, flow: jnp.ndarray, mode: str = "bilinear"):
    """Warp [H, W, C] `src` by [H, W, 2] `flow`.

    Batched use: `jax.vmap(resample2d)`.
    """
    h, w, _ = src.shape
    yy = jnp.arange(h, dtype=flow.dtype)[:, None]
    xx = jnp.arange(w, dtype=flow.dtype)[None, :]
    sx = xx + flow[..., 0]
    sy = yy + flow[..., 1]

    if mode == "nearest":
        ix = jnp.clip(jnp.round(sx).astype(jnp.int32), 0, w - 1)
        iy = jnp.clip(jnp.round(sy).astype(jnp.int32), 0, h - 1)
        return src[iy, ix]

    sx = jnp.clip(sx, 0.0, w - 1.0)
    sy = jnp.clip(sy, 0.0, h - 1.0)
    x0 = jnp.floor(sx).astype(jnp.int32)
    y0 = jnp.floor(sy).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    wx = (sx - x0.astype(flow.dtype))[..., None]
    wy = (sy - y0.astype(flow.dtype))[..., None]

    f00 = src[y0, x0]
    f01 = src[y0, x1]
    f10 = src[y1, x0]
    f11 = src[y1, x1]
    top = f00 * (1 - wx) + f01 * wx
    bot = f10 * (1 - wx) + f11 * wx
    return top * (1 - wy) + bot * wy
