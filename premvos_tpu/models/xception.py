"""Modified-aligned Xception-65 encoder (DeepLabv3+ flavor).

The PReMVOS paper's refinement net is DeepLabv3+ on an Xception-65 encoder
(paper §3.2; reference `refinement_net/network/` expected path — unverified,
mount empty). This provides structural parity for that option
(`RefineConfig.backbone = "xception65"`); ResNet stays the default.

Architecture (Chen et al. 2018, "Encoder-Decoder with Atrous Separable
Convolution"): every conv is a separable conv (depthwise 3×3 + pointwise
1×1, norm+ReLU after each), entry flow downsamples to the output stride,
middle flow is 16 residual units at constant width, exit flow widens to
2048. At output_stride=16 the exit flow runs stride-1 with dilation 2.

Returns {"C2": stride-4 low-level features, "C5": OS16 features} — exactly
what the DeepLabv3+ decoder consumes.

TPU notes: depthwise convs don't use the MXU (they lower to VPU ops), so
Xception trades MXU-dense ResNet FLOPs for bandwidth-lighter separables —
on TPU the ResNet encoder is usually *faster* despite more FLOPs; this
module exists for reference parity and weight conversion.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from premvos_tpu.models.resnet import make_norm


class SepConv(nn.Module):
    """Depthwise 3×3 + pointwise 1×1, norm + ReLU after each."""

    filters: int
    stride: int = 1
    dilation: int = 1
    relu_last: bool = True
    dtype: Any = jnp.float32
    norm: str = "frozen_bn"

    @nn.compact
    def __call__(self, x):
        norm = make_norm(self.norm, self.dtype)
        c = x.shape[-1]
        d = self.dilation
        y = nn.Conv(
            c, (3, 3),
            strides=(self.stride, self.stride),
            kernel_dilation=(d, d),
            padding=[(d, d), (d, d)],
            feature_group_count=c,
            use_bias=False,
            dtype=self.dtype,
            name="depthwise",
        )(x)
        y = nn.relu(norm()(y))
        y = nn.Conv(
            self.filters, (1, 1), use_bias=False, dtype=self.dtype,
            name="pointwise",
        )(y)
        y = norm()(y)
        return nn.relu(y) if self.relu_last else y


class XceptionBlock(nn.Module):
    """Three separable convs with a residual connection.

    skip: 'conv' (1×1 projection — entry/exit flow), 'sum' (identity —
    middle flow), or 'none' (exit-flow tail).
    """

    filters: tuple  # three output widths
    stride: int = 1  # applied on the LAST separable conv
    dilation: int = 1
    skip: str = "conv"
    dtype: Any = jnp.float32
    norm: str = "frozen_bn"

    @nn.compact
    def __call__(self, x):
        y = x
        for i, f in enumerate(self.filters):
            last = i == len(self.filters) - 1
            y = SepConv(
                f,
                stride=self.stride if last else 1,
                dilation=self.dilation,
                relu_last=not (last and self.skip != "none"),
                dtype=self.dtype,
                norm=self.norm,
                name=f"sep{i}",
            )(y)
        if self.skip == "conv":
            res = nn.Conv(
                self.filters[-1], (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="proj",
            )(x)
            res = make_norm(self.norm, self.dtype)()(res)
            return nn.relu(y + res)
        if self.skip == "sum":
            return nn.relu(y + x)
        return y  # 'none': already ReLU'd inside


class Xception65(nn.Module):
    """Returns {"C2": /4 low-level, "C5": /output_stride features}."""

    output_stride: int = 16
    dtype: Any = jnp.float32
    norm: str = "frozen_bn"

    @nn.compact
    def __call__(self, x):
        assert self.output_stride in (16, 32)
        norm = make_norm(self.norm, self.dtype)
        x = x.astype(self.dtype)

        # Entry flow stem: two 3×3 convs, stride 2 on the first.
        x = nn.Conv(
            32, (3, 3), strides=(2, 2), padding="SAME", use_bias=False,
            dtype=self.dtype, name="stem_conv0",
        )(x)
        x = nn.relu(norm()(x))
        x = nn.Conv(
            64, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype,
            name="stem_conv1",
        )(x)
        x = nn.relu(norm()(x))

        feats = {}
        x = XceptionBlock(
            (128, 128, 128), stride=2, dtype=self.dtype, norm=self.norm,
            name="entry_block1",
        )(x)
        feats["C2"] = x  # stride 4 — the decoder's low-level tap
        x = XceptionBlock(
            (256, 256, 256), stride=2, dtype=self.dtype, norm=self.norm,
            name="entry_block2",
        )(x)
        x = XceptionBlock(
            (728, 728, 728), stride=2, dtype=self.dtype, norm=self.norm,
            name="entry_block3",
        )(x)

        # Middle flow: 16 identity-skip units at 728.
        for i in range(16):
            x = XceptionBlock(
                (728, 728, 728), skip="sum", dtype=self.dtype,
                norm=self.norm, name=f"middle_block{i}",
            )(x)

        # Exit flow: at OS16 stride stays 1 and dilation doubles.
        exit_dilation = 2 if self.output_stride == 16 else 1
        exit_stride = 1 if self.output_stride == 16 else 2
        x = XceptionBlock(
            (728, 1024, 1024), stride=exit_stride, dilation=exit_dilation,
            dtype=self.dtype, norm=self.norm, name="exit_block",
        )(x)
        for i, f in enumerate((1536, 1536, 2048)):
            x = SepConv(
                f, dilation=exit_dilation, dtype=self.dtype, norm=self.norm,
                name=f"exit_sep{i}",
            )(x)
        feats["C5"] = x
        return feats
