"""Pallas TPU kernel: RoIAlign (crop_and_resize semantics, aligned).

Replaces `tf.image.crop_and_resize` inside the reference's Mask R-CNN
(SURVEY.md C9).

The XLA einsum formulation (ops.roi_align.roi_align_matmul) is MXU-bound but
materializes a [N, P·s, W, C] intermediate in HBM (hundreds of MB at FPN-P2
scale). This kernel runs the same separable-matmul math with everything in
VMEM: grid = (channel blocks, RoI blocks); the [H, W, CB] feature slab is
fetched once per channel block (the index map is constant across the inner
RoI dimension, so Mosaic keeps it resident), boxes arrive via scalar
prefetch, and the per-RoI 1-D interpolation matrices are built in-kernel
from iota comparisons. Two small dots per RoI ride the MXU; nothing but the
[N, P, P, C] result returns to HBM.

Parity: ops.roi_align.roi_align_reference (fp32 in interpret mode; on real
TPU the MXU rounds dot inputs to bf16 → ~1e-2 differences, same as any
default-precision matmul).

Measured at FPN-P2 scale (120×216×256, 256 RoIs, v5e): pallas 4.5 ms vs
gather 4.7 ms vs einsum 5.6 ms — parity-level, so the XLA paths remain the
default (ops.roi_align.roi_align); this kernel is the scaffold for a fused
multilevel variant (next: all four FPN levels + level-select in one kernel,
removing the 4× waste of multilevel_roi_align).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interp_rows(coords, size):
    """[K] sample coords → [K, size] bilinear weight matrix (edge-clamped,
    zeroed >1px outside), built from iota comparisons (VMEM-friendly)."""
    k = coords.shape[0]
    inside = jnp.logical_and(coords > -1.0, coords < size)
    c = jnp.clip(coords, 0.0, size - 1.0)
    i0 = jnp.floor(c)
    w1 = c - i0
    w0 = 1.0 - w1
    w0 = jnp.where(inside, w0, 0.0)
    w1 = jnp.where(inside, w1, 0.0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (k, size), 1).astype(jnp.float32)
    i0b = i0[:, None]
    i1b = jnp.minimum(i0 + 1, size - 1)[:, None]
    return (cols == i0b) * w0[:, None] + (cols == i1b) * w1[:, None]


def _roi_kernel(
    boxes_ref, feat_ref, out_ref, *, rb, p, s, h, w, scale
):
    i = pl.program_id(1)  # RoI block
    ps = p * s
    feat = feat_ref[:]  # [H, W, CB]
    cb = feat.shape[-1]
    feat2d = feat.reshape(h, w * cb)

    grid_pts = (
        jax.lax.broadcasted_iota(jnp.int32, (ps, 1), 0).astype(jnp.float32)[:, 0]
        + 0.5
    ) / ps

    for r in range(rb):
        idx = i * rb + r
        x1 = boxes_ref[idx, 0] * scale - 0.5
        y1 = boxes_ref[idx, 1] * scale - 0.5
        x2 = boxes_ref[idx, 2] * scale - 0.5
        y2 = boxes_ref[idx, 3] * scale - 0.5
        bw = jnp.maximum(x2 - x1, 1e-6)
        bh = jnp.maximum(y2 - y1, 1e-6)

        ys = y1 + grid_pts * bh
        xs = x1 + grid_pts * bw
        wy = _interp_rows(ys, h).astype(feat.dtype)  # [ps, H]
        wx = _interp_rows(xs, w).astype(feat.dtype)  # [ps, W]

        tmp = jax.lax.dot_general(
            wy, feat2d, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(ps, w, cb).astype(feat.dtype)
        # [ps_x, W] × [ps_y, W, CB] → [ps_y, ps_x, CB], contracting W.
        out_full = jax.lax.dot_general(
            wx, tmp, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [ps_x, ps_y, CB]
        out_full = jnp.transpose(out_full, (1, 0, 2))  # [ps_y, ps_x, CB]
        pooled = out_full.reshape(p, s, p, s, cb).mean(axis=(1, 3))
        out_ref[r] = pooled.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "output_size", "sampling_ratio", "spatial_scale", "roi_block",
        "channel_block", "interpret",
    ),
)
def roi_align_pallas(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    output_size: int = 7,
    sampling_ratio: int = 2,
    spatial_scale: float = 1.0,
    roi_block: int = 8,
    channel_block: int = 128,  # lane tiling: must be a 128-multiple (or C)
    interpret: bool = False,
) -> jnp.ndarray:
    """[H, W, C] features + [N, 4] xyxy boxes → [N, P, P, C].

    Same contract as ops.roi_align.roi_align_reference."""
    h, w, c = features.shape
    n = boxes.shape[0]
    p, s = output_size, sampling_ratio

    cb = min(channel_block, c)
    c_pad = (-c) % cb
    rb = min(roi_block, n)
    n_pad = (-n) % rb
    feats = jnp.pad(features, ((0, 0), (0, 0), (0, c_pad)))
    boxes_p = jnp.pad(boxes.astype(jnp.float32), ((0, n_pad), (0, 0)))
    n_cb = (c + c_pad) // cb
    n_rb = (n + n_pad) // rb

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_cb, n_rb),
        in_specs=[
            pl.BlockSpec(
                (h, w, cb), lambda j, i, *_: (0, 0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (rb, p, p, cb), lambda j, i, *_: (i, 0, 0, j),
            memory_space=pltpu.VMEM,
        ),
    )

    # The feature slab is double-buffered by the pipeline; budget VMEM for
    # both copies plus working set (the default 16M scoped limit is too small
    # for FPN-P2-sized slabs).
    slab_bytes = h * w * cb * feats.dtype.itemsize
    vmem_budget = min(3 * slab_bytes + 16 * 1024 * 1024, 110 * 1024 * 1024)

    out = pl.pallas_call(
        functools.partial(
            _roi_kernel, rb=rb, p=p, s=s, h=h, w=w, scale=spatial_scale
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n + n_pad, p, p, c + c_pad), features.dtype
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_budget),
        interpret=interpret,
    )(boxes_p, feats)
    return out[:n, :, :, :c]
