"""FlowNet2 optical-flow stack: FlowNetC → S → S ∥ SD → Fusion (SURVEY.md C3).

Reference: NVIDIA's flownet2-pytorch fork under `optical_flow_net/`
(`models.py`, `networks/FlowNet{C,S,SD,Fusion}.py`, unverified — mount was
empty). The CUDA ops it depends on (correlation, resample2d, channelnorm)
are the premvos_tpu.ops equivalents.

Design (TPU-first, NHWC, flax):
  * encoders/decoders are plain conv stacks — XLA fuses them onto the MXU;
  * the correlation layer is `ops.correlation` (MXU cost volume);
  * inter-network warping is `ops.resample2d`, brightness error is
    `ops.channelnorm`;
  * every sub-net predicts flow at 1/64..1/4 scales (SD/Fusion finer) and
    refines coarse-to-fine with learned deconv upsampling, as the reference;
  * sub-nets internally predict flow/div_flow (div_flow = 20); `FlowNet2`
    rescales at the seams exactly like the reference stack.

Layer names follow flownet2 conventions (conv3_1, predict_flow6,
upsampled_flow6_to_5, …) to ease future checkpoint conversion; no pretrained
weights ship with this repo (zero egress), so parity is structural.
Input H, W must be multiples of 64.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from premvos_tpu.ops.channelnorm import channelnorm
from premvos_tpu.ops.correlation import correlation
from premvos_tpu.ops.resample2d import resample2d


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.1)


class ConvBlock(nn.Module):
    ch: int
    k: int = 3
    s: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.k // 2
        return _leaky(
            nn.Conv(
                self.ch, (self.k, self.k), strides=(self.s, self.s),
                padding=[(pad, pad)] * 2, dtype=self.dtype,
            )(x)
        )


class Deconv(nn.Module):
    ch: int
    dtype: Any = jnp.float32
    act: bool = True

    @nn.compact
    def __call__(self, x):
        y = nn.ConvTranspose(
            self.ch, (4, 4), strides=(2, 2), padding="SAME", dtype=self.dtype
        )(x)
        return _leaky(y) if self.act else y


class PredictFlow(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(2, (3, 3), padding="SAME", dtype=self.dtype)(x)


class FlowDecoder(nn.Module):
    """Coarse-to-fine refinement over a 5-level feature tower → finest flow.

    Levels are ordered coarse→fine; deconv_ch[i] is the upsampling width into
    level i+1. Returns (finest flow, all flows coarse→fine).
    """

    deconv_ch: tuple = (512, 256, 128, 64)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: tuple):
        coarsest, *finer = feats
        n = len(feats)
        # Name flows by conventional level number (6 = 1/64 for 5-tower nets).
        lvl0 = 7 - n + (n - 1)  # == 6 when n == 5
        flow = PredictFlow(self.dtype, name=f"predict_flow{lvl0}")(coarsest)
        flows = [flow]
        x = coarsest
        for i, feat in enumerate(finer):
            lvl = lvl0 - 1 - i
            up_feat = Deconv(self.deconv_ch[i], self.dtype, name=f"deconv{lvl}")(x)
            up_flow = Deconv(
                2, self.dtype, act=False, name=f"upsampled_flow{lvl + 1}_to_{lvl}"
            )(flow)
            x = jnp.concatenate([feat, up_feat, up_flow], axis=-1)
            flow = PredictFlow(self.dtype, name=f"predict_flow{lvl}")(x)
            flows.append(flow)
        return flow, flows


def upsample_flow(flow: jnp.ndarray, hw: tuple, scale: float = 1.0) -> jnp.ndarray:
    """Bilinear upsample a [B, h, w, 2] flow field; scale magnitudes."""
    out = jax.image.resize(flow, (*flow.shape[:-3], *hw, 2), method="bilinear")
    return out * scale


class _CEncoder(nn.Module):
    """FlowNetC conv1-3, shared (called once per image → tied weights)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c1 = ConvBlock(64, 7, 2, self.dtype, name="conv1")(x)
        c2 = ConvBlock(128, 5, 2, self.dtype, name="conv2")(c1)
        c3 = ConvBlock(256, 5, 2, self.dtype, name="conv3")(c2)
        return c1, c2, c3


class FlowNetC(nn.Module):
    """Correlation variant. (img1, img2) [B,H,W,3] → flow/div_flow at 1/4."""

    max_displacement: int = 20
    corr_stride: int = 2
    dtype: Any = jnp.float32
    return_pyramid: bool = False

    def setup(self):
        self.encoder = _CEncoder(self.dtype)
        self.conv_redir = ConvBlock(32, 1, 1, self.dtype)
        self.conv3_1 = ConvBlock(256, 3, 1, self.dtype)
        self.conv4 = ConvBlock(512, 3, 2, self.dtype)
        self.conv4_1 = ConvBlock(512, 3, 1, self.dtype)
        self.conv5 = ConvBlock(512, 3, 2, self.dtype)
        self.conv5_1 = ConvBlock(512, 3, 1, self.dtype)
        self.conv6 = ConvBlock(1024, 3, 2, self.dtype)
        self.conv6_1 = ConvBlock(1024, 3, 1, self.dtype)
        self.decoder = FlowDecoder(dtype=self.dtype)

    def __call__(self, img1, img2):
        _, c2a, c3a = self.encoder(img1)
        _, _, c3b = self.encoder(img2)

        corr = correlation(
            c3a.astype(jnp.float32),
            c3b.astype(jnp.float32),
            self.max_displacement,
            self.corr_stride,
        )
        corr = _leaky(corr.astype(self.dtype))
        redir = self.conv_redir(c3a)
        x3 = self.conv3_1(jnp.concatenate([corr, redir], axis=-1))
        x4 = self.conv4_1(self.conv4(x3))
        x5 = self.conv5_1(self.conv5(x4))
        x6 = self.conv6_1(self.conv6(x5))
        flow, flows = self.decoder((x6, x5, x4, x3, c2a))
        if self.return_pyramid:
            return flow, flows
        return flow  # 1/4 resolution, units = pixels/div_flow


class FlowNetS(nn.Module):
    """Plain encoder variant; input channels vary (12 inside FlowNet2).

    return_pyramid=True additionally returns the coarse→fine flow list for
    multi-scale EPE training (reference `losses.py` trains on all scales).
    """

    dtype: Any = jnp.float32
    return_pyramid: bool = False

    def setup(self):
        self.conv1 = ConvBlock(64, 7, 2, self.dtype)
        self.conv2 = ConvBlock(128, 5, 2, self.dtype)
        self.conv3 = ConvBlock(256, 5, 2, self.dtype)
        self.conv3_1 = ConvBlock(256, 3, 1, self.dtype)
        self.conv4 = ConvBlock(512, 3, 2, self.dtype)
        self.conv4_1 = ConvBlock(512, 3, 1, self.dtype)
        self.conv5 = ConvBlock(512, 3, 2, self.dtype)
        self.conv5_1 = ConvBlock(512, 3, 1, self.dtype)
        self.conv6 = ConvBlock(1024, 3, 2, self.dtype)
        self.conv6_1 = ConvBlock(1024, 3, 1, self.dtype)
        self.decoder = FlowDecoder(dtype=self.dtype)

    def __call__(self, x):
        c2 = self.conv2(self.conv1(x))
        c3 = self.conv3_1(self.conv3(c2))
        c4 = self.conv4_1(self.conv4(c3))
        c5 = self.conv5_1(self.conv5(c4))
        c6 = self.conv6_1(self.conv6(c5))
        flow, flows = self.decoder((c6, c5, c4, c3, c2))
        if self.return_pyramid:
            return flow, flows
        return flow  # 1/4 resolution


class FlowNetSD(nn.Module):
    """Small-displacement variant: all-3×3 encoder starting at full res."""

    dtype: Any = jnp.float32

    def setup(self):
        self.conv0 = ConvBlock(64, 3, 1, self.dtype)
        self.conv1 = ConvBlock(64, 3, 2, self.dtype)
        self.conv1_1 = ConvBlock(128, 3, 1, self.dtype)
        self.conv2 = ConvBlock(128, 3, 2, self.dtype)
        self.conv2_1 = ConvBlock(128, 3, 1, self.dtype)
        self.conv3 = ConvBlock(256, 3, 2, self.dtype)
        self.conv3_1 = ConvBlock(256, 3, 1, self.dtype)
        self.conv4 = ConvBlock(512, 3, 2, self.dtype)
        self.conv4_1 = ConvBlock(512, 3, 1, self.dtype)
        self.conv5 = ConvBlock(512, 3, 2, self.dtype)
        self.conv5_1 = ConvBlock(512, 3, 1, self.dtype)
        self.conv6 = ConvBlock(1024, 3, 2, self.dtype)
        self.conv6_1 = ConvBlock(1024, 3, 1, self.dtype)
        self.decoder = FlowDecoder(dtype=self.dtype)

    def __call__(self, x):
        c2 = self.conv2_1(self.conv2(self.conv1_1(self.conv1(self.conv0(x)))))
        c3 = self.conv3_1(self.conv3(c2))
        c4 = self.conv4_1(self.conv4(c3))
        c5 = self.conv5_1(self.conv5(c4))
        c6 = self.conv6_1(self.conv6(c5))
        flow, _ = self.decoder((c6, c5, c4, c3, c2))
        return flow  # 1/4 resolution


class FlowNetFusion(nn.Module):
    """Full-resolution fusion net: 11-channel input → 2-channel flow."""

    dtype: Any = jnp.float32

    def setup(self):
        self.conv0 = ConvBlock(64, 3, 1, self.dtype)
        self.conv1 = ConvBlock(64, 3, 2, self.dtype)
        self.conv1_1 = ConvBlock(128, 3, 1, self.dtype)
        self.conv2 = ConvBlock(128, 3, 2, self.dtype)
        self.conv2_1 = ConvBlock(128, 3, 1, self.dtype)
        self.decoder = FlowDecoder(deconv_ch=(32, 16), dtype=self.dtype)

    def __call__(self, x):
        c0 = self.conv0(x)  # 1/1
        c1 = self.conv1_1(self.conv1(c0))  # 1/2
        c2 = self.conv2_1(self.conv2(c1))  # 1/4
        flow, _ = self.decoder((c2, c1, c0))
        return flow  # full resolution


class FlowNet2(nn.Module):
    """The full stack. (img1, img2) in [0, 1] → flow in pixels, full res.

    variant: 'flownetc' | 'flownet2cs' | 'flownet2css' | 'flownet2'
    """

    variant: str = "flownet2"
    max_displacement: int = 20
    corr_stride: int = 2
    div_flow: float = 20.0
    dtype: Any = jnp.float32
    # Inter-network warp implementation. "block" = ops.resample2d_block, the
    # block-sliced residual-window warp with no per-pixel gathers (exact for
    # the smooth flows these warps consume — they are upsampled from
    # 1/4-resolution predictions); "gather" = the XLA per-pixel gather path
    # (the parity oracle; measured ~10 ms per 448×832 warp on v5e, which
    # made the four in-net warps ~64% of the whole pipeline frame budget —
    # docs/STAGE_BUDGET.md).
    warp_impl: str = "block"

    def setup(self):
        self.flownetc = FlowNetC(
            self.max_displacement, self.corr_stride, dtype=self.dtype
        )
        if self.variant in ("flownet2cs", "flownet2css", "flownet2"):
            self.flownets_1 = FlowNetS(dtype=self.dtype)
        if self.variant in ("flownet2css", "flownet2"):
            self.flownets_2 = FlowNetS(dtype=self.dtype)
        if self.variant == "flownet2":
            self.flownetsd = FlowNetSD(dtype=self.dtype)
            self.flownetfusion = FlowNetFusion(dtype=self.dtype)

    def _warp(self, img, flow):
        from premvos_tpu.ops.resample2d import resample2d_block

        if self.warp_impl == "block":
            # batched natively (the Pallas path cannot be vmapped)
            return resample2d_block(img, flow)
        return jax.vmap(resample2d)(img, flow)

    def _s_refine(self, net, img1, img2, flow_px):
        """One FlowNetS refinement pass at full resolution semantics."""
        warped = self._warp(img2, flow_px)
        err = channelnorm(img1 - warped)
        x = jnp.concatenate(
            [img1, img2, warped, flow_px / self.div_flow, err], axis=-1
        ).astype(self.dtype)
        flow = net(x)
        return upsample_flow(
            flow.astype(jnp.float32), img1.shape[-3:-1], 4.0 * self.div_flow
        )

    def __call__(self, img1, img2):
        hw = img1.shape[-3:-1]
        # Mean-normalize per pair (reference subtracts the RGB mean of the pair).
        mean = jnp.mean(
            jnp.concatenate([img1, img2], axis=-1), axis=(-3, -2), keepdims=True
        )
        mean = jnp.mean(mean.reshape(*mean.shape[:-1], 2, 3), axis=-2)
        i1 = (img1 - mean).astype(self.dtype)
        i2 = (img2 - mean).astype(self.dtype)

        flow_c = self.flownetc(i1, i2)  # 1/4 res, /div_flow
        flow_px = upsample_flow(
            flow_c.astype(jnp.float32), hw, 4.0 * self.div_flow
        )
        if self.variant == "flownetc":
            return flow_px

        flow_px = self._s_refine(self.flownets_1, i1, i2, flow_px)
        if self.variant == "flownet2cs":
            return flow_px

        flow_px = self._s_refine(self.flownets_2, i1, i2, flow_px)
        if self.variant == "flownet2css":
            return flow_px

        # Small-displacement branch + fusion.
        flow_sd_q = self.flownetsd(jnp.concatenate([i1, i2], axis=-1))
        flow_sd = upsample_flow(
            flow_sd_q.astype(jnp.float32), hw, 4.0 * self.div_flow
        )

        warped_css = self._warp(i2.astype(jnp.float32), flow_px)
        warped_sd = self._warp(i2.astype(jnp.float32), flow_sd)
        err_css = channelnorm(i1.astype(jnp.float32) - warped_css)
        err_sd = channelnorm(i1.astype(jnp.float32) - warped_sd)
        mag_css = channelnorm(flow_px)
        mag_sd = channelnorm(flow_sd)
        fuse_in = jnp.concatenate(
            [
                i1.astype(jnp.float32),
                flow_px / self.div_flow,
                flow_sd / self.div_flow,
                mag_css,
                mag_sd,
                err_css,
                err_sd,
            ],
            axis=-1,
        ).astype(self.dtype)
        fused = self.flownetfusion(fuse_in)
        return fused.astype(jnp.float32) * self.div_flow
