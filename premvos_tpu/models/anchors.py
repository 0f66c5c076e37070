"""Anchor generation for the RPN.

Reference: anchor/target logic lives in the TF Mask R-CNN's `data.py`/
`model.py` (unverified — mount was empty). One scale per FPN level,
3 aspect ratios, anchors centered on feature cells. All shapes static given
the (padded) image size, so the whole grid is a compile-time constant under
jit.
"""

from __future__ import annotations

import numpy as np

from premvos_tpu.models.fpn import FPN_LEVELS, FPN_STRIDES


def level_anchors(
    feat_h: int, feat_w: int, stride: int, scale: float, ratios
) -> np.ndarray:
    """[feat_h * feat_w * A, 4] xyxy anchors for one pyramid level."""
    cy = (np.arange(feat_h) + 0.5) * stride
    cx = (np.arange(feat_w) + 0.5) * stride
    ws, hs = [], []
    for r in ratios:
        # area scale², aspect h/w = r
        w = scale / np.sqrt(r)
        h = scale * np.sqrt(r)
        ws.append(w)
        hs.append(h)
    ws = np.asarray(ws)[None, None, :]
    hs = np.asarray(hs)[None, None, :]
    cxg = cx[None, :, None]
    cyg = cy[:, None, None]
    boxes = np.stack(
        [
            np.broadcast_to(cxg - ws / 2, (feat_h, feat_w, len(ratios))),
            np.broadcast_to(cyg - hs / 2, (feat_h, feat_w, len(ratios))),
            np.broadcast_to(cxg + ws / 2, (feat_h, feat_w, len(ratios))),
            np.broadcast_to(cyg + hs / 2, (feat_h, feat_w, len(ratios))),
        ],
        axis=-1,
    )
    return boxes.reshape(-1, 4).astype(np.float32)


def pyramid_anchors(image_h: int, image_w: int, scales, ratios) -> dict:
    """{level: [Ni, 4]} anchors for every FPN level of a padded image."""
    out = {}
    for lvl, scale in zip(FPN_LEVELS, scales):
        s = FPN_STRIDES[lvl]
        fh, fw = (image_h + s - 1) // s, (image_w + s - 1) // s
        out[lvl] = level_anchors(fh, fw, s, scale, ratios)
    return out
