"""Stage 3: optical flow + mask warping (SURVEY.md C3, call stack §3.4).

Reference flow: per-pair CUDA forward → write `.flo` → merge reads and warps
masks in numpy. Here: one batched jitted forward over all consecutive pairs,
flow stays in HBM, and warping is `ops.resample2d`.

Direction convention: the merge stage *backward-warps* the previous frame's
masks into the current frame, so we compute flow(frame_t → frame_{t−1}) —
sampling prev_mask at (x + u, y + v) pulls each current-frame pixel's value
from where it was in the previous frame.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from premvos_tpu.ops.resample2d import resample2d


def run_flow_pairs(model, params, frames, infer_hw=None):
    """frames: [T, H, W, 3] in [0, 1]. Returns backward flow [T−1, H, W, 2]
    where entry t is flow(frame_{t+1} → frame_t).

    If infer_hw is given, frames are bilinearly resized for the net (H, W
    must be 64-multiples) and the flow is resized/rescaled back.
    """
    t, h, w, _ = frames.shape
    cur = frames[1:]
    prev = frames[:-1]

    if infer_hw is not None and infer_hw != (h, w):
        ih, iw = infer_hw
        cur_r = jax.image.resize(cur, (t - 1, ih, iw, 3), "bilinear")
        prev_r = jax.image.resize(prev, (t - 1, ih, iw, 3), "bilinear")
        flow = model.apply(params, cur_r, prev_r)
        flow = jax.image.resize(flow, (t - 1, h, w, 2), "bilinear")
        flow = flow * jnp.array([w / iw, h / ih], flow.dtype)
    else:
        flow = model.apply(params, cur, prev)
    return flow


def warp_masks(
    masks: jnp.ndarray, flow: jnp.ndarray, impl: str = "block"
) -> jnp.ndarray:
    """Backward-warp [K, H, W] masks by one [H, W, 2] flow field.

    impl="block" (default): masks packed as channels through
    `ops.resample2d.resample2d_block` — the block-sliced residual-window
    warp shares its window slices and bilinear weights across all K masks
    and contains NO per-pixel gathers (exact for smooth flow; see the op's
    docstring for the exactness envelope).

    impl="gather": per-mask four-corner advanced indexing — the exact
    XLA-gather path (measured 13.9/3.2/0.7 ms at stride 1/2/4 for K=8
    @480×864 on v5e; kept as the parity oracle). Two other formulations
    measured catastrophically slower on TPU: vmapping the 2×2-patch gather
    over masks (operand batching → ~100 ms/mask) and packing masks into the
    GATHER's channel dim (~850 ms — tiny-slice gathers)."""
    from premvos_tpu.ops.resample2d import resample2d_block, resample2d_reference

    if impl == "block":
        packed = jnp.moveaxis(masks, 0, -1)  # [H, W, K]
        return jnp.moveaxis(resample2d_block(packed, flow), -1, 0)
    warped = jax.vmap(
        lambda m: resample2d_reference(m[..., None], flow)[..., 0]
    )(masks)
    return warped


def warp_masks_coarse(
    masks: jnp.ndarray, flow: jnp.ndarray, stride: int, impl: str = "block"
) -> jnp.ndarray:
    """Backward-warp at 1/stride resolution, then upsample.

    XLA lowers the bilinear warp to per-pixel dynamic gathers — the least
    TPU-friendly op in the merge scan (no MXU, scalarized addressing). Masks
    are smooth blobs and flow comes from a net that already predicted at
    1/4 resolution, so warping on a stride-s grid then bilinearly upsampling
    changes soft-IoU scores marginally while cutting the gather count s².
    stride=1 falls back to the exact path.
    """
    if stride <= 1:
        return warp_masks(masks, flow, impl)
    k, h, w = masks.shape
    hs, ws = h // stride, w // stride
    flow_s = (
        jax.image.resize(flow, (hs, ws, 2), "bilinear") / float(stride)
    )
    masks_s = jax.image.resize(masks, (k, hs, ws), "bilinear")
    warped_s = warp_masks(masks_s, flow_s, impl)
    return jax.image.resize(warped_s, (k, h, w), "bilinear")
