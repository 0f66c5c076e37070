"""ResNet backbones (50/101), NHWC, flax.linen.

The reference carries three separate ResNet implementations: the TF Mask
R-CNN's `basemodel.py`, the OnAVOS-family `network/Layers.py` used by the
refinement and ReID nets, and torchvision-style blocks inside flownet-adjacent
code (SURVEY.md C1/C2/C4; unverified — mount was empty). Here one backbone
serves all heads; variants are expressed through arguments:

  * `output_stride=32` (default) exposes C2..C5 for FPN,
  * `output_stride=16` dilates the C5 stage for DeepLabv3+,
  * `num_stages` trims the tower for small encoders.

TPU notes: NHWC layout (XLA's native conv layout on TPU), bottleneck widths
are 128-multiples so the MXU tiles cleanly, compute dtype is a parameter
(bfloat16 for throughput; params stay fp32). BatchNorm is *frozen* (inference
statistics, gradients only through scale/bias) — standard for detection
fine-tuning and required for tiny per-video fine-tune batches.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

STAGE_BLOCKS = {
    26: (1, 1, 1, 1),  # minimal bottleneck net for tests/dryruns
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


class FrozenBatchNorm(nn.Module):
    """BatchNorm with frozen statistics.

    mean/var are parameters excluded from gradient flow via stop_gradient;
    scale/bias train. Matches detection-style fine-tuning (and the per-video
    fine-tune regime, where batches are too small for live BN).
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (c,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (c,), jnp.float32)
        mean = lax.stop_gradient(mean)
        var = lax.stop_gradient(var)
        inv = (scale / jnp.sqrt(var + 1e-5)).astype(self.dtype)
        b = (bias - mean * scale / jnp.sqrt(var + 1e-5)).astype(self.dtype)
        return x * inv + b


class GroupNorm32(nn.Module):
    """GroupNorm with ≤32 groups (largest divisor of C that is ≤32).

    The trainable-normalization option for from-scratch training: frozen BN
    is right for fine-tuning pretrained weights, but in a zero-egress
    environment training from scratch is the only route to weights, and
    training through identity-stats BN underperforms. Batch-independent, so
    per-video fine-tune batches stay valid too.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = 32
        while c % g:
            g -= 1
        return nn.GroupNorm(num_groups=g, dtype=self.dtype, name="gn")(x)


def make_norm(norm: str, dtype):
    """Norm-layer factory: 'frozen_bn' (default; pretrained/finetune) or
    'group_norm' (from-scratch training)."""
    if norm == "frozen_bn":
        return lambda: FrozenBatchNorm(dtype)
    if norm == "group_norm":
        return lambda: GroupNorm32(dtype)
    raise ValueError(f"unknown norm {norm!r}")


class Bottleneck(nn.Module):
    """ResNet v1.5 bottleneck (stride on the 3×3 conv)."""

    filters: int  # inner width; output is 4×
    strides: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32
    norm: str = "frozen_bn"

    @nn.compact
    def __call__(self, x):
        residual = x
        out_ch = self.filters * 4
        norm = make_norm(self.norm, self.dtype)

        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.filters,
            (3, 3),
            strides=(self.strides, self.strides),
            kernel_dilation=(self.dilation, self.dilation),
            padding=[(self.dilation, self.dilation)] * 2,
            use_bias=False,
            dtype=self.dtype,
        )(y)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = norm()(y)

        if residual.shape[-1] != out_ch or self.strides != 1:
            residual = nn.Conv(
                out_ch,
                (1, 1),
                strides=(self.strides, self.strides),
                use_bias=False,
                dtype=self.dtype,
                name="proj",
            )(x)
            residual = norm()(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Returns {"C2": /4, "C3": /8, "C4": /16, "C5": /32 or /16 dilated}.

    remat=True rematerializes each bottleneck on the backward pass
    (jax.checkpoint) — trades FLOPs for HBM, enabling large fine-tune
    batches at 385²+ resolutions.
    """

    depth: int = 101
    output_stride: int = 32  # 32 for FPN, 16 dilates C5 (DeepLabv3+)
    dtype: Any = jnp.float32
    remat: bool = False
    norm: str = "frozen_bn"

    @nn.compact
    def __call__(self, x):
        blocks = STAGE_BLOCKS[self.depth]
        block_cls = nn.remat(Bottleneck) if self.remat else Bottleneck
        x = x.astype(self.dtype)

        # Stem: 7×7/2 + 3×3 maxpool/2.
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, name="stem_conv",
        )(x)
        x = make_norm(self.norm, self.dtype)()(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        feats = {}
        widths = (64, 128, 256, 512)
        for stage, (n_blocks, width) in enumerate(zip(blocks, widths)):
            first_stride = 1 if stage == 0 else 2
            dilation = 1
            if stage == 3 and self.output_stride == 16:
                first_stride, dilation = 1, 2
            for b in range(n_blocks):
                x = block_cls(
                    width,
                    strides=first_stride if b == 0 else 1,
                    dilation=dilation,
                    dtype=self.dtype,
                    norm=self.norm,
                    name=f"stage{stage + 2}_block{b}",
                )(x)
            feats[f"C{stage + 2}"] = x
        return feats
