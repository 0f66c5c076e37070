"""Pallas TPU kernel: block-sliced residual-window bilinear warp.

Replaces the reference's CUDA `resample2d_kernel.cu` (SURVEY.md C7) on the
hot paths: FlowNet2's four in-net warps and the merge stage's mask warping.

Strategy (see ops.resample2d.resample2d_block for the algorithm): the XLA
pre-pass computes per-block window origins (integer base displacement) and
per-pixel local target coordinates; this kernel then, per block,

  1. DMAs ONE [C, winh, winw] channel-first window of the edge-padded
     source from HBM into VMEM. The origin is data-dependent — exactly what
     a BlockSpec cannot express, hence manual DMA (same playbook as the
     correlation kernel). Mosaic requires DMA origins/shapes on the
     (sublane, lane) tile grid, so the origin is rounded DOWN to (8, 128):
     the row slack (< 8) is absorbed by extending the weighted vertical
     window, and the lane slack (< 128) by a one-hot LANE-PERMUTATION
     MATMUL in VMEM (the classic TPU idiom for dynamic lane shifts — rides
     the MXU; `pltpu.roll` with a traced shift was observed to miscompile
     on v5e);
  2. accumulates the dense residual window of shifted FMAs entirely in
     VMEM/registers — bilinear weights `relu(1 − |t − d|)` pick each
     pixel's 2×2 corners.

The kernel is natively BATCHED: a batch of images is just more blocks
(per-block origins carry a batch coordinate), so FlowNet2's [B, H, W, 3]
warps run as one pallas_call without vmap (vmapping a manual-DMA kernel is
not supported).

The pure-XLA formulation round-trips HBM on every one of the win² shifted
terms (measured ~8 ms for 8 packed 480×864 masks on v5e); here each source
element crosses HBM once (plus alignment halo).

Parity: ops.resample2d.resample2d_block(use_pallas=False) (same math) and
resample2d_reference (exact for smooth flows). Forward-only: the production
users (inference warps) never differentiate through it; training code that
needs gradients uses the XLA path (use_pallas=False) or the gather ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from premvos_tpu.ops.resample2d import _block_prep, _block_reassemble


def _warp_kernel(
    starts_ref, src_ref, ty_ref, tx_ref, out_ref, win_ref, sem,
    *, win, by, bx,
):
    i = pl.program_id(0)
    winh = win_ref.shape[1]
    winw = win_ref.shape[2]
    bi = starts_ref[0, i]
    sy = pl.multiple_of(starts_ref[1, i], 8)
    sx = pl.multiple_of(starts_ref[2, i], 128)
    dma = pltpu.make_async_copy(
        src_ref.at[bi, :, pl.ds(sy, winh), pl.ds(sx, winw)],
        win_ref,
        sem,
    )
    dma.start()

    ty = ty_ref[0][None]  # [1, by, bx] — broadcasts over C
    tx = tx_ref[0][None]
    # the vertical tile slack (0..7) shifts the target row coordinate
    ty = ty + starts_ref[3, i].astype(jnp.float32)
    # horizontal corner weights are reused by every vertical term
    whs = [jnp.maximum(0.0, 1.0 - jnp.abs(tx - dx)) for dx in range(win)]

    # one-hot lane permutation: P[v, j] = 1 iff v == j + slack_x, so
    # (w @ P^T)[..., j] = w[..., j + slack_x]
    slack_x = starts_ref[4, i]
    cols = jax.lax.broadcasted_iota(jnp.int32, (winw, winw), 0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (winw, winw), 1)
    perm = (cols == rows + slack_x).astype(jnp.float32)

    dma.wait()
    w = win_ref[...].astype(jnp.float32)  # [C, winh, winw]
    c = w.shape[0]
    # HIGHEST: the MXU's default bf16 multiply would round the f32 window
    # values (0.4 % error); with a 0/1 permutation matrix HIGHEST makes the
    # product exact, and the matmul is tiny.
    w = jax.lax.dot_general(
        w.reshape(c * winh, winw),
        perm,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(c, winh, winw)
    acc = jnp.zeros((c, by, bx), jnp.float32)
    for dy in range(win + 8):  # +8: vertical tile slack absorbed in weights
        wv = jnp.maximum(0.0, 1.0 - jnp.abs(ty - dy))
        row = whs[0] * w[:, dy : dy + by, 0:bx]
        for dx in range(1, win):
            row = row + whs[dx] * w[:, dy : dy + by, dx : dx + bx]
        acc = acc + wv * row
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block", "residual", "max_flow", "interpret"),
)
def resample2d_block_pallas(
    src: jnp.ndarray,
    flow: jnp.ndarray,
    block: tuple = (8, 128),
    residual: int = 4,
    max_flow: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """[(B,) H, W, C] src × [(B,) H, W, 2] flow → backward-warped output
    (same contract and exactness envelope as ops.resample2d.resample2d_block;
    a leading batch dim maps to more kernel blocks, not vmap)."""
    batched = src.ndim == 4
    if not batched:
        src, flow = src[None], flow[None]
    b = src.shape[0]
    out_dtype = jnp.promote_types(src.dtype, flow.dtype)

    # geometry is static (shape-only)
    h, w, cc = src.shape[1:]
    byg, bxg = block
    wing = 2 * int(residual) + 2
    hbg, wbg = h + (-h % byg), w + (-w % bxg)
    g = dict(
        h=h, w=w, c=cc, hb=hbg, wb=wbg, nby=hbg // byg, nbx=wbg // bxg,
        by=byg, bx=bxg, winh=byg + wing, winw=bxg + wing, win=wing,
    )
    src_big, starts, t_y, t_x = jax.vmap(
        lambda s, f: _block_prep(s, f, block, residual, max_flow)[:4]
    )(src, flow)
    nb = starts.shape[1]
    c, by, bx, win = g["c"], g["by"], g["bx"], g["win"]

    # Per-block records [b·nb, 5]: (batch, aligned y, aligned x, slack y,
    # slack x). Tile-aligned DMA origins; the window additionally covers
    # by + win rows below the slacked origin and bx + win lanes after the
    # lane permutation.
    ys, xs = starts[..., 0], starts[..., 1]
    ys_al, xs_al = (ys // 8) * 8, (xs // 128) * 128
    bidx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, nb))
    # [5, b·nb] layout: SMEM pads every ROW to ~512 B, so keep rows few
    recs = jnp.stack(
        [bidx, ys_al, xs_al, ys - ys_al, xs - xs_al], axis=-1
    ).reshape(b * nb, 5).T.astype(jnp.int32)
    t_y = t_y.reshape(b * nb, by, bx)
    t_x = t_x.reshape(b * nb, by, bx)
    winh = -(-(g["winh"] + 8) // 8) * 8
    winw = -(-(g["winw"] + 128) // 128) * 128

    out = pl.pallas_call(
        functools.partial(_warp_kernel, win=win, by=by, bx=bx),
        grid=(b * nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # records [5, b·nb]
            pl.BlockSpec(memory_space=pltpu.ANY),  # src_big (manual DMA)
            pl.BlockSpec(
                (1, by, bx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, by, bx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, c, by, bx), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * nb, c, by, bx), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((c, winh, winw), src_big.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(recs, src_big, t_y, t_x)
    out = jax.vmap(lambda o: _block_reassemble(o, g, out_dtype))(
        out.reshape(b, nb, c, by, bx)
    )
    return out if batched else out[0]
