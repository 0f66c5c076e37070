"""Pallas TPU kernel: fused multilevel (FPN) RoIAlign.

The XLA path (models.maskrcnn.multilevel_roi_align) computes RoIAlign on ALL
four pyramid levels and one-hot-selects per RoI — 4× the needed FLOPs, the
standard static-shape trick. This kernel keeps all four level slabs resident
in VMEM per channel block and computes each RoI ONLY on its assigned level
via a `lax.switch`, eliminating the 4× waste while staying fully static.

Grid = (channel blocks, RoI blocks); boxes and per-RoI level indices arrive
via scalar prefetch; per-RoI interpolation matrices are built in-kernel from
iota comparisons and applied as two MXU dots (same math as
ops.roi_align.roi_align_matmul).

Parity: models.maskrcnn.multilevel_roi_align (fp32 in interpret mode; on TPU
within default-matmul bf16 rounding — measured 1.1e-2 abs on |mean|≈0.17).

STATUS (end of round 1): standalone fp32 measurement beat the XLA path
(7.28 ms vs 9.04 ms, 256 RoIs, full FPN geometry, lax.switch version), but
the switch version spilled 121 MB of vregs inside the full maskrcnn program
(VMEM OOM). The predicated-@pl.when rewrite fits memory but executes every
level's block serially per RoI (~10× slower in situ) and showed a bf16
numerical regression (detections vanished). Wiring is therefore gated OFF
behind PREMVOS_FUSED_ALIGN=1 (models.maskrcnn.multilevel_roi_align_auto);
the XLA 4-level path remains production. Round-2 plan: sort RoIs by level
outside the kernel and use a per-level grid partition (no per-RoI branch at
all) with a native batch dimension.
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


def _kernel(boxes_ref, levels_ref, f2, f3, f4, f5, out_ref, tmp_ref,
            *, rb, p, s):
    i = pl.program_id(1)
    ps = p * s
    feat_refs = (f2, f3, f4, f5)
    cb = f2.shape[-1]

    grid_pts = (
        jax.lax.broadcasted_iota(jnp.int32, (ps, 1), 0).astype(jnp.float32)[:, 0]
        + 0.5
    ) / ps

    for r in range(rb):
        idx = i * rb + r
        lvl = levels_ref[idx]

        # Predicated per-level blocks (NOT lax.switch: a switch makes Mosaic
        # hold every branch's [ps, W·CB] intermediate in vregs at once —
        # observed 121 MB of spill slots). The intermediate round-trips
        # through a VMEM scratch instead.
        for li, (fref, stride) in enumerate(zip(feat_refs, STRIDES)):

            @pl.when(lvl == li + 2)
            def _(fref=fref, stride=stride):
                feat = fref[:]
                h, w = feat.shape[0], feat.shape[1]
                scale = 1.0 / stride
                x1 = boxes_ref[idx, 0] * scale - 0.5
                y1 = boxes_ref[idx, 1] * scale - 0.5
                x2 = boxes_ref[idx, 2] * scale - 0.5
                y2 = boxes_ref[idx, 3] * scale - 0.5
                bw = jnp.maximum(x2 - x1, 1e-6)
                bh = jnp.maximum(y2 - y1, 1e-6)
                ys = y1 + grid_pts * bh
                xs = x1 + grid_pts * bw
                # First (big) dot in the feature dtype on the MXU; second dot
                # is tiny and runs fully fp32 against the f32 scratch.
                wy = _interp_rows(ys, h).astype(feat.dtype)  # [ps, H]
                wx = _interp_rows(xs, w)  # [ps, W] f32
                tmp_ref[:, :w, :] = jax.lax.dot_general(
                    wy, feat.reshape(h, w * cb), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(ps, w, cb)
                out = jax.lax.dot_general(
                    wx, tmp_ref[:, :w, :], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [ps_x, ps_y, CB]
                pooled_full = jnp.transpose(out, (1, 0, 2))
                out_ref[r] = (
                    pooled_full.reshape(p, s, p, s, cb).mean(axis=(1, 3))
                ).astype(out_ref.dtype)


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
    → [N, P, P, C]."""
    c = p2.shape[-1]
    n = boxes.shape[0]
    p, s = output_size, sampling_ratio
    cb = min(channel_block, c)
    rb = min(roi_block, n)
    n_pad = (-n) % rb
    c_pad = (-c) % cb

    feats = [
        jnp.pad(f, ((0, 0), (0, 0), (0, c_pad))) for f in (p2, p3, p4, p5)
    ]
    boxes_p = jnp.pad(boxes.astype(jnp.float32), ((0, n_pad), (0, 0)))
    levels_p = jnp.pad(levels.astype(jnp.int32), (0, n_pad))
    n_cb = (c + c_pad) // cb
    n_rb = (n + n_pad) // rb

    # Keep the budget tight: v5e has 128M VMEM for the WHOLE program and the
    # detect path runs this kernel twice amid other kernels. Slabs are
    # double-buffered; working set (interp matrices, tmp, out window) ≤ ~4M.
    slab = sum(f.shape[0] * f.shape[1] for f in feats) * cb * feats[0].dtype.itemsize
    vmem_budget = min(2 * slab + 8 * 1024 * 1024, 100 * 1024 * 1024)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # boxes, levels
        grid=(n_cb, n_rb),
        in_specs=[
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
            # Shared intermediate (sized for the widest level, P2): keeps the
            # [ps, W·CB] product in VMEM instead of vregs.
            pltpu.VMEM((p * s, feats[0].shape[1], cb), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, rb=rb, p=p, s=s),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n + n_pad, p, p, c + c_pad), p2.dtype
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_budget),
        interpret=interpret,
    )(boxes_p, levels_p, *feats)
    return out[:n, :, :, :c]
