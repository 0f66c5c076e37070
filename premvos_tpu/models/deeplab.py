"""DeepLabv3+-style proposal refinement network (SURVEY.md C2).

Reference: the OnAVOS-family refinement net (`refinement_net/network/`,
unverified — mount was empty). Input is a 385×385 crop around the proposal
box (expanded ~50 px) with a 4th channel encoding the coarse mask/box; output
is a pixel-accurate binary mask for that proposal (paper §3.2).

Architecture: ResNet encoder at output-stride 16 (dilated C5) → ASPP (atrous
rates 6/12/18 + image-level pooling) → decoder that fuses 4×-upsampled ASPP
features with low-level C2 features → 2-class logits at input resolution.

TPU notes: crops arrive as a fixed-size batch [N, S, S, 4] (N = padded
proposal count), so the whole stage is one dense batched conv net — the most
MXU-friendly stage in the pipeline. Bilinear resizes use `jax.image.resize`
(lowers to XLA gather/scatter-free convolutional resize).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from premvos_tpu.config import RefineConfig
from premvos_tpu.models.resnet import ResNet, make_norm
from premvos_tpu.models.xception import Xception65


def _resize(x: jnp.ndarray, hw: tuple) -> jnp.ndarray:
    return jax.image.resize(
        x, (*x.shape[:-3], *hw, x.shape[-1]), method="bilinear"
    )


class ASPP(nn.Module):
    channels: int = 256
    rates: tuple = (6, 12, 18)
    dtype: Any = jnp.float32
    norm: str = "frozen_bn"

    @nn.compact
    def __call__(self, x):
        norm = make_norm(self.norm, self.dtype)
        h, w = x.shape[-3:-1]
        branches = [
            nn.relu(
                norm()(
                    nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype)(x)
                )
            )
        ]
        for r in self.rates:
            y = nn.Conv(
                self.channels,
                (3, 3),
                kernel_dilation=(r, r),
                padding=[(r, r), (r, r)],
                use_bias=False,
                dtype=self.dtype,
            )(x)
            branches.append(nn.relu(norm()(y)))
        # Image-level pooling branch.
        pooled = jnp.mean(x, axis=(-3, -2), keepdims=True)
        pooled = nn.relu(
            norm()(
                nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype)(pooled)
            )
        )
        branches.append(jnp.broadcast_to(pooled, branches[0].shape))

        y = jnp.concatenate(branches, axis=-1)
        y = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype)(y)
        return nn.relu(norm()(y))


class DeepLabV3Plus(nn.Module):
    cfg: RefineConfig = RefineConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, crops: jnp.ndarray) -> jnp.ndarray:
        """[N, S, S, 4] crops (RGB + coarse-mask channel) → [N, S, S] logits
        (foreground − background)."""
        n, s = crops.shape[0], crops.shape[1]
        norm = make_norm(self.cfg.norm, self.dtype)
        if self.cfg.backbone == "xception65":
            # Paper-parity encoder (PReMVOS §3.2 uses Xception-65).
            encoder = Xception65(
                output_stride=self.cfg.output_stride,
                dtype=self.dtype,
                norm=self.cfg.norm,
                name="encoder",
            )
        else:
            encoder = ResNet(
                depth=self.cfg.backbone_depth,
                output_stride=self.cfg.output_stride,
                dtype=self.dtype,
                norm=self.cfg.norm,
                name="encoder",
            )
        feats = encoder(crops.astype(self.dtype))

        y = ASPP(
            channels=self.cfg.aspp_channels,
            rates=self.cfg.aspp_rates,
            dtype=self.dtype,
            norm=self.cfg.norm,
            name="aspp",
        )(feats["C5"])

        # Decoder: ×4 up, fuse with reduced C2, two 3×3 convs.
        low = feats["C2"]
        low = nn.relu(
            norm()(
                nn.Conv(
                    self.cfg.low_level_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="low_proj",
                )(low)
            )
        )
        y = _resize(y, low.shape[-3:-1])
        y = jnp.concatenate([y, low], axis=-1)
        for i in range(2):
            y = nn.relu(
                norm()(
                    nn.Conv(
                        self.cfg.decoder_channels, (3, 3), padding="SAME",
                        use_bias=False, dtype=self.dtype, name=f"dec{i}",
                    )(y)
                )
            )
        logits = nn.Conv(2, (1, 1), dtype=self.dtype, name="cls")(y)
        logits = _resize(logits.astype(jnp.float32), (s, s))
        return logits[..., 1] - logits[..., 0]
