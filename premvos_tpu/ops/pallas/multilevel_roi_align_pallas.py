"""Pallas TPU kernel: fused multilevel (FPN) RoIAlign, level-sorted.

The XLA path (models.maskrcnn.multilevel_roi_align) computes RoIAlign on ALL
four pyramid levels and one-hot-selects per RoI — 4× the needed FLOPs, the
standard static-shape trick. This kernel computes each RoI only on its
assigned level. Replaces `tf.image.crop_and_resize` + FPN level routing
inside the reference's Mask R-CNN (SURVEY.md C9, expected
`MaskRCNN/model.py::roi_align` — unverified, mount empty).

Round-1 history (see git): a per-RoI `lax.switch` version spilled 121 MB of
vregs inside the full Mask R-CNN program, and a per-RoI predicated version
executed all four levels' latency serially per RoI (~10× in situ). Round-2
design — the kernel's own STATUS plan — removes per-RoI branching entirely:

  * RoIs are SORTED BY LEVEL outside the kernel (argsort + inverse gather
    after), so each RoI block is level-homogeneous except at ≤3 seams;
  * the kernel processes a whole RoI block per level with ONE pair of
    batched MXU dots ([rb·ps, H] × [H, W·CB] — M=rb·ps instead of ps, so
    the systolic array is actually occupied), rows of off-level RoIs zeroed;
  * levels with zero RoIs in the block are skipped via a scalar-prefetched
    [n_rb, 4] count table (`@pl.when(count > 0)`) — with sorted input at
    most 2 of 4 level bodies run per block, usually 1;
  * the big [rb·ps, W·CB] intermediate lives in a VMEM scratch (never in
    vregs); per-level contributions accumulate into the resident out block.

Parity: models.maskrcnn.multilevel_roi_align (exact in fp32 interpret mode;
on TPU within default-matmul bf16 rounding). See
tests/test_pallas_multilevel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from premvos_tpu.ops.pallas.roi_align_pallas import _interp_rows

# FPN geometry (models.fpn): P2..P5 strides.
STRIDES = (4, 8, 16, 32)


def _interp_rows_2d(coords, size):
    """[rb, ps] sample coords → [rb, ps, size] bilinear weights (edge-
    clamped, zeroed >1px outside) — iota comparisons only, no gathers."""
    rb, ps = coords.shape
    inside = jnp.logical_and(coords > -1.0, coords < size)
    c = jnp.clip(coords, 0.0, size - 1.0)
    i0 = jnp.floor(c)
    w1 = c - i0
    w0 = jnp.where(inside, 1.0 - w1, 0.0)
    w1 = jnp.where(inside, w1, 0.0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (rb, ps, size), 2).astype(
        jnp.float32
    )
    return (cols == i0[..., None]) * w0[..., None] + (
        cols == jnp.minimum(i0 + 1, size - 1)[..., None]
    ) * w1[..., None]


def _kernel(counts_ref, boxes_ref, levels_ref, f2, f3, f4, f5, out_ref,
            tmp_ref, *, rb, p, s):
    i = pl.program_id(1)
    ps = p * s
    feat_refs = (f2, f3, f4, f5)
    cb = f2.shape[-1]

    out_ref[...] = jnp.zeros_like(out_ref)

    # [rb, ps] sample fractions along the RoI (vectorized — Mosaic rejects
    # concatenations of per-RoI scalar-built vectors).
    grid_pts = (
        jax.lax.broadcasted_iota(jnp.int32, (rb, ps), 1).astype(jnp.float32)
        + 0.5
    ) / ps

    for li, (fref, stride) in enumerate(zip(feat_refs, STRIDES)):

        @pl.when(counts_ref[i, li] > 0)
        def _(fref=fref, stride=stride, li=li):
            h, w = fref.shape[0], fref.shape[1]
            scale = 1.0 / stride

            boxes = boxes_ref[...]  # [rb, 4] VMEM block for this RoI block
            on = (levels_ref[...] == li + 2).astype(jnp.float32)  # [rb, 1]
            x1 = boxes[:, 0:1] * scale - 0.5
            y1 = boxes[:, 1:2] * scale - 0.5
            x2 = boxes[:, 2:3] * scale - 0.5
            y2 = boxes[:, 3:4] * scale - 0.5
            bw = jnp.maximum(x2 - x1, 1e-6)
            bh = jnp.maximum(y2 - y1, 1e-6)
            ys = y1 + grid_pts * bh  # [rb, ps]
            xs = x1 + grid_pts * bw

            wy = (
                _interp_rows_2d(ys, h) * on[..., None]
            ).reshape(rb * ps, h).astype(fref.dtype)
            wx = _interp_rows_2d(xs, w)  # [rb, ps, W] fp32; wy carries mask
            wx = wx.reshape(rb * ps, w)

            # Big dot on the MXU, result straight into VMEM scratch (never
            # materialized in vregs): [rb·ps, H] × [H, W·CB] → [rb·ps, W·CB].
            # fp32 features pin HIGHEST so parity matches the XLA path
            # (which pins it in ops.roi_align); bf16 production is exact-bf16.
            prec = (
                jax.lax.Precision.HIGHEST
                if fref.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT
            )
            tmp_ref[:, : w * cb] = jax.lax.dot_general(
                wy, fref[:].reshape(h, w * cb), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )

            # Small batched dot: contract W per RoI.
            # lhs [rb, ps_x, W] · rhs [rb, ps_y, W, CB] → [rb, ps_x, ps_y, CB]
            out = jax.lax.dot_general(
                wx.reshape(rb, ps, w),
                tmp_ref[:, : w * cb].reshape(rb, ps, w, cb),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            out = jnp.transpose(out, (0, 2, 1, 3))  # [rb, ps_y, ps_x, CB]
            pooled = out.reshape(rb, p, s, p, s, cb).mean(axis=(2, 4))
            out_ref[...] = out_ref[...] + pooled.astype(out_ref.dtype)


def _sort_by_level(boxes, levels, rb):
    """Pad to an rb multiple and stable-sort by level. Returns
    (sorted boxes, sorted levels, [n_rb, 4] per-block level counts,
    inverse permutation for the first N outputs)."""
    n = boxes.shape[0]
    n_pad = (-n) % rb
    boxes_p = jnp.pad(boxes.astype(jnp.float32), ((0, n_pad), (0, 0)))
    # Padding sorts to the end (level 6 > any real level) and its count
    # lands outside the 4 tracked levels, so padded RoIs are never computed.
    levels_p = jnp.concatenate(
        [levels.astype(jnp.int32), jnp.full((n_pad,), 6, jnp.int32)]
    )
    order = jnp.argsort(levels_p, stable=True)
    inv = jnp.argsort(order, stable=True)[:n]
    sb = boxes_p[order]
    sl = levels_p[order]
    n_rb = (n + n_pad) // rb
    blk = sl.reshape(n_rb, rb)
    counts = jnp.stack(
        [jnp.sum(blk == l, axis=1) for l in (2, 3, 4, 5)], axis=1
    ).astype(jnp.int32)
    return sb, sl, counts, inv


@functools.partial(
    jax.jit,
    static_argnames=("output_size", "sampling_ratio", "roi_block",
                     "channel_block", "interpret"),
)
def multilevel_roi_align_pallas(
    p2: jnp.ndarray,
    p3: jnp.ndarray,
    p4: jnp.ndarray,
    p5: jnp.ndarray,
    boxes: jnp.ndarray,
    levels: jnp.ndarray,
    output_size: int = 7,
    sampling_ratio: int = 2,
    roi_block: int = 8,
    channel_block: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """P2..P5 [Hi, Wi, C] + boxes [N, 4] (image coords) + levels [N] ∈ 2..5
    → [N, P, P, C] (each RoI aligned only on its assigned level)."""
    c = p2.shape[-1]
    n = boxes.shape[0]
    p, s = output_size, sampling_ratio
    cb = min(channel_block, c)
    rb = min(roi_block, n)
    c_pad = (-c) % cb

    sb, sl, counts, inv = _sort_by_level(boxes, levels, rb)
    n_rb = sb.shape[0] // rb

    feats = [
        jnp.pad(f, ((0, 0), (0, 0), (0, c_pad))) for f in (p2, p3, p4, p5)
    ]
    n_cb = (c + c_pad) // cb

    # VMEM: 4 level slabs (double-buffered by the pipeline; index maps are
    # constant in the RoI dimension so they stay resident across RoI blocks)
    # + the fp32 [rb·ps, Wmax·CB] scratch + the out window.
    slab = sum(f.shape[0] * f.shape[1] for f in feats) * cb * feats[0].dtype.itemsize
    wmax = max(f.shape[1] for f in feats)
    scratch_bytes = rb * p * s * wmax * cb * 4
    vmem_budget = min(
        2 * slab + scratch_bytes + 40 * 1024 * 1024, 126 * 1024 * 1024
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # per-block level counts (drives @pl.when)
        grid=(n_cb, n_rb),
        in_specs=[
            pl.BlockSpec(
                (rb, 4), lambda j, i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (rb, 1), lambda j, i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
        ]
        + [
            pl.BlockSpec(
                (f.shape[0], f.shape[1], cb), lambda j, i, *_: (0, 0, j),
                memory_space=pltpu.VMEM,
            )
            for f in feats
        ],
        out_specs=pl.BlockSpec(
            (rb, p, p, cb), lambda j, i, *_: (i, 0, 0, j),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((rb * p * s, wmax * cb), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, rb=rb, p=p, s=s),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((sb.shape[0], p, p, c + c_pad), p2.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_budget),
        interpret=interpret,
    )(counts, sb, sl.astype(jnp.float32)[:, None], *feats)
    return out[inv, :, :, :c]
