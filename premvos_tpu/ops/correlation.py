"""Correlation (cost volume) for FlowNetC.

Reference: the CUDA `correlation_package` in the flownet2 fork
(optical_flow_net/networks/correlation_package/, unverified — reference mount
was empty; see SURVEY.md). FlowNetC parameters: pad 20, max_displacement 20,
kernel_size 1, stride1 1, stride2 2 → a 21×21 = 441-channel cost volume where

  out[y, x, d] = (1/C) · Σ_c f1[y, x, c] · f2[y+dy, x+dx, c]

for displacements (dy, dx) ∈ {−20, −18, …, 20}². The CUDA kernel normalizes
by `sumelems = kernel² · C`; with kernel 1 that is a mean over channels.

Implementations (identical math; all accept [H, W, C] or [B, H, W, C]):
  * `correlation_reference` — `lax.scan` over the 441 shifts. Parity oracle.
  * `correlation_mxu` — 21 batched matmuls (one per row displacement) +
    stride-2 diagonal extraction; MXU-bound, XLA-only.
  * `correlation_pallas` (ops/pallas/correlation_pallas.py) — each input
    element read from HBM once, all channels accumulated in VMEM; measured
    3.3× faster than the einsum path at FlowNetC scale on v5e.

`correlation` is the public op: Pallas forward on TPU (einsum on CPU) with a
custom VJP whose backward is a scan of shifted products — both gradients are
themselves correlation-shaped ops.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp


def displacement_grid(max_displacement: int = 20, stride: int = 2):
    """The (D², 2) list of (dy, dx) displacements, row-major, and D."""
    d = 2 * (max_displacement // stride) + 1
    r = jnp.arange(d) * stride - max_displacement
    dy, dx = jnp.meshgrid(r, r, indexing="ij")
    return jnp.stack([dy.ravel(), dx.ravel()], axis=-1), d


def _batched(f1):
    return f1.ndim == 4


def correlation_reference(
    f1: jnp.ndarray,
    f2: jnp.ndarray,
    max_displacement: int = 20,
    stride: int = 2,
) -> jnp.ndarray:
    """Cost volume: [(B,) H, W, C] × 2 → [(B,) H, W, D²]."""
    if not _batched(f1):
        return correlation_reference(f1[None], f2[None], max_displacement, stride)[0]
    b, h, w, c = f1.shape
    disps, _ = displacement_grid(max_displacement, stride)
    pad = max_displacement
    f2p = jnp.pad(f2, ((0, 0), (pad, pad), (pad, pad), (0, 0)))

    def one_shift(_, d):
        dy, dx = d[0] + pad, d[1] + pad
        shifted = jax.lax.dynamic_slice(f2p, (0, dy, dx, 0), (b, h, w, c))
        return None, jnp.sum(f1 * shifted, axis=-1)

    _, vol = jax.lax.scan(one_shift, None, disps)  # [D², B, H, W]
    return jnp.transpose(vol, (1, 2, 3, 0)) / c


def correlation_mxu(
    f1: jnp.ndarray,
    f2: jnp.ndarray,
    max_displacement: int = 20,
    stride: int = 2,
) -> jnp.ndarray:
    """MXU formulation: per row-displacement batched matmul + diagonals."""
    if not _batched(f1):
        return correlation_mxu(f1[None], f2[None], max_displacement, stride)[0]
    b, h, w, c = f1.shape
    pad = max_displacement
    d = 2 * (pad // stride) + 1
    f2p = jnp.pad(f2, ((0, 0), (pad, pad), (pad, pad), (0, 0)))

    outs = []
    for i in range(d):
        dy = i * stride  # row offset into padded f2 (dy_actual = dy − pad)
        rows2 = jax.lax.dynamic_slice(
            f2p, (0, dy, 0, 0), (b, h, w + 2 * pad, c)
        )
        m = jnp.einsum(
            "bywc,byvc->bywv", f1, rows2, preferred_element_type=f1.dtype
        )
        diags = [
            jnp.diagonal(m, offset=k * stride, axis1=2, axis2=3)
            for k in range(d)
        ]
        outs.append(jnp.stack(diags, axis=-1))  # [B, H, W, D]
    return jnp.concatenate(outs, axis=-1) / c


def _correlation_fwd_impl(f1, f2, max_displacement, stride):
    use_pallas = (
        os.environ.get("PREMVOS_PALLAS", "1") != "0"
        and jax.default_backend() != "cpu"
    )
    if use_pallas:
        from premvos_tpu.ops.pallas.correlation_pallas import correlation_pallas

        return correlation_pallas(f1, f2, max_displacement, stride)
    return correlation_mxu(f1, f2, max_displacement, stride)


def _correlation_grads(f1, f2, g, max_displacement, stride):
    """Backward pass: both grads are scans of shifted products.

      df1[y,x,c] = (1/C) Σ_d g[y,x,d] · f2[y+dy, x+dx, c]
      df2[v,u,c] = (1/C) Σ_d g[v−dy, u−dx, d] · f1[v−dy, u−dx, c]
    """
    squeeze = not _batched(f1)
    if squeeze:
        f1, f2, g = f1[None], f2[None], g[None]
    b, h, w, c = f1.shape
    pad = max_displacement
    disps, _ = displacement_grid(max_displacement, stride)
    f2p = jnp.pad(f2, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    gk = jnp.moveaxis(g, -1, 0)  # [D², B, H, W]

    def body(carry, xs):
        df1, df2p = carry
        d, g_d = xs
        dy, dx = d[0] + pad, d[1] + pad
        shifted = jax.lax.dynamic_slice(f2p, (0, dy, dx, 0), (b, h, w, c))
        df1 = df1 + g_d[..., None] * shifted
        contrib = g_d[..., None] * f1  # [B, H, W, C]
        patch = jax.lax.dynamic_slice(df2p, (0, dy, dx, 0), (b, h, w, c))
        df2p = jax.lax.dynamic_update_slice(
            df2p, patch + contrib, (0, dy, dx, 0)
        )
        return (df1, df2p), None

    init = (jnp.zeros_like(f1), jnp.zeros_like(f2p))
    (df1, df2p), _ = jax.lax.scan(body, init, (disps, gk))
    df2 = df2p[:, pad : pad + h, pad : pad + w, :]
    df1, df2 = df1 / c, df2 / c
    if squeeze:
        df1, df2 = df1[0], df2[0]
    return df1, df2


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def correlation(f1, f2, max_displacement: int = 20, stride: int = 2):
    """Public cost-volume op: [(B,) H, W, C] × 2 → [(B,) H, W, D²].

    Pallas forward on TPU, einsum on CPU; custom VJP (trainable)."""
    return _correlation_fwd_impl(f1, f2, max_displacement, stride)


def _corr_fwd(f1, f2, max_displacement, stride):
    return _correlation_fwd_impl(f1, f2, max_displacement, stride), (f1, f2)


def _corr_bwd(max_displacement, stride, res, g):
    f1, f2 = res
    return _correlation_grads(f1, f2, g, max_displacement, stride)


correlation.defvjp(_corr_fwd, _corr_bwd)
