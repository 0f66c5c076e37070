"""Feature Pyramid Network on ResNet C2..C5 → P2..P6.

Reference: the PReMVOS proposal net is a Mask R-CNN with FPN (paper §3.1;
expected in the TF Mask R-CNN's `model.py`/`basemodel.py`, unverified — mount
was empty). Lateral 1×1 + top-down nearest-×2 + output 3×3; P6 is stride-2
max-pool of P5 (RPN-only level).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

FPN_STRIDES = {"P2": 4, "P3": 8, "P4": 16, "P5": 32, "P6": 64}
FPN_LEVELS = ("P2", "P3", "P4", "P5", "P6")


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2× upsample, NHWC (repeat — cheap, layout-friendly)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class FPN(nn.Module):
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: dict) -> dict:
        names = ["C2", "C3", "C4", "C5"]
        laterals = [
            nn.Conv(self.channels, (1, 1), dtype=self.dtype, name=f"lat_{n}")(
                feats[n]
            )
            for n in names
        ]
        # Top-down pathway.
        tops = [laterals[-1]]
        for lat in laterals[-2::-1]:
            tops.append(lat + _upsample2x(tops[-1]))
        tops = tops[::-1]  # P2-aligned order

        out = {}
        for n, t in zip(names, tops):
            p = "P" + n[1]
            out[p] = nn.Conv(
                self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                name=f"out_{p}",
            )(t)
        out["P6"] = nn.max_pool(out["P5"], (1, 1), strides=(2, 2))
        return out
