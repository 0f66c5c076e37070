"""Fast R-CNN box head and class-agnostic mask head.

Reference: `fastrcnn_head` / `maskrcnn_head` in the TF Mask R-CNN's
`model.py` (unverified — mount was empty). PReMVOS runs category-agnostic
(2 classes: object/background) with a class-agnostic mask branch, low score
threshold, high proposal recall (paper §3.1).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class BoxHead(nn.Module):
    """2-FC head → classification logits + class-agnostic box deltas."""

    num_classes: int = 2
    hidden: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray):
        # roi_feats: [K, P, P, C]
        k = roi_feats.shape[0]
        x = roi_feats.reshape(k, -1)
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        logits = nn.Dense(self.num_classes, dtype=self.dtype)(x)
        deltas = nn.Dense(4, dtype=self.dtype)(x)  # class-agnostic
        return logits, deltas


class MaskHead(nn.Module):
    """4× conv + 2× deconv + 1×1 → [K, 2P, 2P] class-agnostic mask logits."""

    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray):
        x = roi_feats
        for i in range(4):
            x = nn.relu(
                nn.Conv(
                    self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                    name=f"conv{i}",
                )(x)
            )
        x = nn.relu(
            nn.ConvTranspose(
                self.channels, (2, 2), strides=(2, 2), dtype=self.dtype,
                name="deconv",
            )(x)
        )
        x = nn.Conv(1, (1, 1), dtype=self.dtype, name="logits")(x)
        return x[..., 0]  # [K, 2P, 2P]
