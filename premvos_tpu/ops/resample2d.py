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

import jax
import jax.numpy as jnp


def resample2d(src: jnp.ndarray, flow: jnp.ndarray, mode: str = "bilinear"):
    """Warp [H, W, C] `src` by [H, W, 2] `flow`.

    Bilinear path: ONE `lax.gather` of 2×2×C patches instead of four
    whole-image gathers — the per-index overhead dominates on TPU, so
    amortizing 4 corner reads into one gather measured 1.36× faster at
    448×832×3 (exact parity; see scripts/bench_resample_variants.py). The
    base index is clamped to size−2 with the fraction recomputed, which
    reproduces edge-clamp semantics exactly.

    Batched use: `jax.vmap(resample2d)`.
    """
    h, w, c = src.shape
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
    y0 = jnp.minimum(jnp.floor(sy), h - 2).astype(jnp.int32)
    x0 = jnp.minimum(jnp.floor(sx), w - 2).astype(jnp.int32)
    wy = (sy - y0)[..., None]
    wx = (sx - x0)[..., None]

    starts = jnp.stack([y0, x0], axis=-1).reshape(h * w, 2)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )
    # Gather in fp32: sub-word (bf16) operands push XLA's TPU gather onto a
    # drastically slower path; the cast is bandwidth-trivial next to the
    # gather's index overhead. Output stays at the weights' promoted dtype
    # (fp32 for fp32 flow), matching the four-corner formulation.
    patches = jax.lax.gather(
        src.astype(jnp.float32), starts, dnums, slice_sizes=(2, 2, c),
        mode=jax.lax.GatherScatterMode.CLIP,
    ).reshape(h, w, 2, 2, c)
    top = patches[:, :, 0, 0] * (1 - wx) + patches[:, :, 0, 1] * wx
    bot = patches[:, :, 1, 0] * (1 - wx) + patches[:, :, 1, 1] * wx
    out = top * (1 - wy) + bot * wy
    # The gather ran in fp32 (see above); restore the promoted dtype of
    # (src, flow) so bf16-pipeline callers get bf16 back, matching
    # resample2d_reference's dtype exactly.
    return out.astype(jnp.promote_types(src.dtype, flow.dtype))


def resample2d_reference(src, flow, mode: str = "bilinear"):
    """Four-corner advanced-indexing formulation (parity oracle for tests)."""
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
