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


def _block_prep(src, flow, block, residual, max_flow):
    """Shared preprocessing for the block warp (XLA and Pallas paths).

    Returns (src_big [C, Hpad, Wpad] channel-first edge-padded, starts
    [nb, 2] int32 window origins into src_big, t_y/t_x [nb, by, bx] f32
    local target coords, geom dict)."""
    h, w, c = src.shape
    by, bx = block
    r = int(residual)
    win = 2 * r + 2  # candidate displacements per axis
    lf = float(max_flow)

    # LOOSE clip (±max_flow, not into the image): pre-clipping to the image
    # would create artificial residual spread in border clamp zones; the
    # edge-padded margins below reproduce clamp semantics exactly instead.
    yy = jnp.arange(h, dtype=flow.dtype)[:, None]
    xx = jnp.arange(w, dtype=flow.dtype)[None, :]
    sy = jnp.clip(yy + flow[..., 1], -lf, h - 1.0 + lf)
    sx = jnp.clip(xx + flow[..., 0], -lf, w - 1.0 + lf)

    hp, wp = -h % by, -w % bx
    if hp or wp:
        # pad the coordinate maps to block multiples (src itself is padded
        # once below, together with the window margins)
        sy = jnp.pad(sy, ((0, hp), (0, wp)), mode="edge")
        sx = jnp.pad(sx, ((0, hp), (0, wp)), mode="edge")
    hb, wb = h + hp, w + wp
    nby, nbx = hb // by, wb // bx
    winh, winw = by + win, bx + win

    # [nby, nbx, by, bx] block view of the (clamped) source coordinates.
    sy_b = sy.reshape(nby, by, nbx, bx).transpose(0, 2, 1, 3)
    sx_b = sx.reshape(nby, by, nbx, bx).transpose(0, 2, 1, 3)

    # Per-block integer base displacement: rounded mean of (source − own
    # coordinate) over the block's VALID pixels only — padded pixels carry
    # edge-clamped coordinates that would bias the mean and push real
    # pixels' residuals out of the window.
    oy = (jnp.arange(nby) * by)[:, None]
    ox = (jnp.arange(nbx) * bx)[None, :]
    yy_b = (oy[..., None, None] + jnp.arange(by)[:, None]).astype(flow.dtype)
    xx_b = (ox[..., None, None] + jnp.arange(bx)[None, :]).astype(flow.dtype)
    valid = jnp.logical_and(yy_b < h, xx_b < w).astype(flow.dtype)
    nv = jnp.maximum(jnp.sum(valid, axis=(2, 3)), 1.0)
    mean_dy = jnp.round(jnp.sum((sy_b - yy_b) * valid, axis=(2, 3)) / nv)
    mean_dx = jnp.round(jnp.sum((sx_b - xx_b) * valid, axis=(2, 3)) / nv)

    # Window starts in ORIGINAL coordinates (may be negative / past the
    # border near image edges). Rather than clamping the start — which
    # silently shifts residuals out of the window and breaks exactness for
    # interior pixels of border blocks — pad the source with enough edge
    # margin that every window fits: starts are bounded below by
    # −max_flow−(by−1)−r and above by h−1+max_flow−r.
    ws_y = oy + mean_dy.astype(jnp.int32) - r
    ws_x = ox + mean_dx.astype(jnp.int32) - r
    my, mx = by + r + int(lf), bx + r + int(lf)  # front margins
    # CHANNEL-FIRST internal layout: the window column axis (bx-wide, a
    # multiple of the 128-lane vector width for good block choices) must be
    # the minor dim — channels-minor wastes (128 − C)/128 of every vector
    # (measured 6× slower for C=8 packed masks).
    # After-margins carry extra slack so the Pallas path's (8, 128)
    # tile-ALIGNED window DMAs (start rounded down + padded shape) stay in
    # bounds.
    src_big = jnp.pad(
        jnp.moveaxis(src, -1, 0),
        (
            (0, 0),
            (my, hp + by + r + 2 + int(lf) + 40),
            (mx, wp + bx + r + 2 + int(lf) + 384),
        ),
        mode="edge",
    )

    starts = jnp.stack(
        [
            jnp.broadcast_to(ws_y + my, (nby, nbx)).reshape(-1),
            jnp.broadcast_to(ws_x + mx, (nby, nbx)).reshape(-1),
        ],
        axis=-1,
    ).astype(jnp.int32)

    # Local target coordinates relative to (window start + own row/col):
    # t ∈ [0, win−1] selects the displacement pair; clamp = graceful
    # fallback for residual outliers AND image-border windows.
    rr = jnp.arange(by, dtype=flow.dtype)[:, None]
    qq = jnp.arange(bx, dtype=flow.dtype)[None, :]
    t_y = sy_b - ws_y[..., None, None].astype(flow.dtype) - rr
    t_x = sx_b - ws_x[..., None, None].astype(flow.dtype) - qq
    t_y = jnp.clip(t_y, 0.0, win - 1.0).reshape(-1, by, bx).astype(jnp.float32)
    t_x = jnp.clip(t_x, 0.0, win - 1.0).reshape(-1, by, bx).astype(jnp.float32)

    geom = dict(
        h=h, w=w, c=c, hb=hb, wb=wb, nby=nby, nbx=nbx, by=by, bx=bx,
        winh=winh, winw=winw, win=win,
    )
    return src_big, starts, t_y, t_x, geom


def _block_reassemble(out, geom, out_dtype):
    """[nb, C, by, bx] block outputs → [H, W, C]."""
    g = geom
    out = (
        out.reshape(g["nby"], g["nbx"], g["c"], g["by"], g["bx"])
        .transpose(2, 0, 3, 1, 4)
        .reshape(g["c"], g["hb"], g["wb"])[:, : g["h"], : g["w"]]
    )
    return jnp.moveaxis(out, 0, -1).astype(out_dtype)


def resample2d_block(
    src: jnp.ndarray,
    flow: jnp.ndarray,
    block: tuple | None = None,
    residual: int = 4,
    max_flow: int = 64,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Block-sliced residual-window warp — the TPU-fast EXACT bilinear path.

    XLA lowers per-pixel gathers to scalarized addressing (measured ~10 ms
    for one 448×832×3 warp, ~15 ms for 8 packed 480×864 masks on v5e — see
    scripts/bench_flow_breakdown.py), which made the in-net FlowNet2 warps
    64 % of the pipeline frame budget. This formulation removes per-pixel
    gathers entirely:

      1. split the image into (by, bx) blocks; per block take ONE dynamic
         slice of src at the block's mean integer displacement — a gather of
         few LARGE slices, the one regime where TPU gathers are cheap;
      2. the remaining per-pixel displacement (residual r = flow − block
         mean) is bounded for smooth flow; cover it with a dense
         (2R+2)×(2R+2) window of STATIC shifted fused multiply-adds over the
         block — pure VPU work, bilinear weights `relu(1 − |t − d|)` pick
         the right 2×2 corners per pixel.

    EXACT (bit-comparable to `resample2d_reference` up to fp reassociation)
    whenever |flow| ≤ `max_flow` and each pixel's integer displacement is
    within `residual` of its block's rounded mean — always true for smooth
    flow (FlowNet outputs are upsampled from 1/4-resolution predictions).
    Image-border clamp semantics are reproduced exactly by edge padding:
    out-of-image samples land in the padded margin whose values equal the
    border pixel. Pixels beyond the residual window (violent motion
    boundaries, where bilinear warp is ill-defined anyway) or beyond
    max_flow clamp gracefully to the window edge.

    src: [H, W, C]; flow: [H, W, 2]. Pads H/W internally to block multiples.
    For warping K masks by one flow, pack them as channels ([H, W, K]) —
    the windows and weights are shared across channels.

    On TPU the residual-window accumulation runs as a Pallas kernel
    (ops/pallas/resample2d_pallas.py) that keeps the whole window sum in
    VMEM; the pure-XLA path below is the fallback/oracle (each of the win²
    shifted FMAs round-trips HBM — measured ~8 ms for 8 packed 480×864
    masks vs sub-ms for the kernel). `PREMVOS_PALLAS=0` kills the kernel.
    `block=None` picks (8, 128) for the kernel (small blocks keep the
    exactness envelope tight and cost the kernel nothing) and (32, 128) for
    the XLA path (fewer, larger blocks amortize its HBM round-trips).
    """
    import os

    if use_pallas is None:
        use_pallas = (
            os.environ.get("PREMVOS_PALLAS", "1") != "0"
            and jax.default_backend() != "cpu"
        )
    if block is None:
        block = (8, 128) if use_pallas else (32, 128)
    out_dtype = jnp.promote_types(src.dtype, flow.dtype)

    if use_pallas:
        from premvos_tpu.ops.pallas.resample2d_pallas import (
            resample2d_block_pallas,
        )

        # batched ([B, H, W, C]) input maps to more kernel blocks natively
        return resample2d_block_pallas(
            src, flow, block=block, residual=residual, max_flow=max_flow
        )
    if src.ndim == 4:
        return jax.vmap(
            lambda s, f: resample2d_block(
                s, f, block, residual, max_flow, use_pallas=False
            )
        )(src, flow)

    src_big, starts, t_y, t_x, g = _block_prep(
        src, flow, block, residual, max_flow
    )
    c, by, bx, win = g["c"], g["by"], g["bx"], g["win"]

    # One big slice per block: [nb, C, winh, winw].
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
    )
    f32 = jnp.float32
    windows = jax.lax.gather(
        src_big.astype(f32), starts, dnums,
        slice_sizes=(c, g["winh"], g["winw"]),
        mode=jax.lax.GatherScatterMode.CLIP,
    )

    t_y = t_y[:, None]  # [nb, 1, by, bx] broadcast over C
    t_x = t_x[:, None]
    nb = windows.shape[0]
    out = jnp.zeros((nb, c, by, bx), f32)
    for dy in range(win):
        wv = jnp.maximum(0.0, 1.0 - jnp.abs(t_y - dy))
        row = jnp.zeros((nb, c, by, bx), f32)
        for dx in range(win):
            wh = jnp.maximum(0.0, 1.0 - jnp.abs(t_x - dx))
            row = row + wh * windows[:, :, dy : dy + by, dx : dx + bx]
        out = out + wv * row
    return _block_reassemble(out, g, out_dtype)


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
