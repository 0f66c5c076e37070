"""Correlation (cost volume) for FlowNetC.

Reference: the CUDA `correlation_package` in the flownet2 fork
(optical_flow_net/networks/correlation_package/, unverified — reference mount
was empty; see SURVEY.md). FlowNetC parameters: pad 20, max_displacement 20,
kernel_size 1, stride1 1, stride2 2 → a 21×21 = 441-channel cost volume where

  out[y, x, d] = (1/C) · Σ_c f1[y, x, c] · f2[y+dy, x+dx, c]

for displacements (dy, dx) ∈ {−20, −18, …, 20}². The CUDA kernel normalizes by
`sumelems = kernel² · C`; with kernel 1 that is a mean over channels.

Three implementations, identical math:
  * `correlation_reference` — `lax.scan` over the 441 shifts; one fused
    multiply-reduce per step. The parity oracle. Bandwidth-bound (re-reads
    f1/f2 per shift).
  * `correlation_mxu` — the TPU-native default. For each of the 21 row
    displacements, a batched matmul f1[y] @ f2[y+dy]ᵀ over rows computes every
    column displacement at once on the MXU; the 21 stride-2 diagonals of each
    [W, W+2p] row-correlation matrix are then extracted. ~7× more FLOPs than
    minimal but they ride the systolic array, and each f2 row is read 21×
    instead of 441×.
  * Pallas kernel (`ops/pallas/correlation_pallas.py`) — fuses the diagonal
    extraction into the matmul tile loop, opt-in via `PREMVOS_PALLAS=1`.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def displacement_grid(max_displacement: int = 20, stride: int = 2):
    """The (D², 2) list of (dy, dx) displacements, row-major, and D."""
    d = 2 * (max_displacement // stride) + 1
    r = jnp.arange(d) * stride - max_displacement
    dy, dx = jnp.meshgrid(r, r, indexing="ij")
    return jnp.stack([dy.ravel(), dx.ravel()], axis=-1), d


def correlation_reference(
    f1: jnp.ndarray,
    f2: jnp.ndarray,
    max_displacement: int = 20,
    stride: int = 2,
) -> jnp.ndarray:
    """Cost volume between [H, W, C] feature maps → [H, W, D²].

    Batched use: `jax.vmap(correlation_reference, in_axes=(0, 0, None, None))`.
    """
    h, w, c = f1.shape
    disps, _ = displacement_grid(max_displacement, stride)
    pad = max_displacement
    f2p = jnp.pad(f2, ((pad, pad), (pad, pad), (0, 0)))

    def one_shift(_, d):
        dy, dx = d[0] + pad, d[1] + pad
        shifted = jax.lax.dynamic_slice(f2p, (dy, dx, 0), (h, w, c))
        return None, jnp.sum(f1 * shifted, axis=-1)

    _, vol = jax.lax.scan(one_shift, None, disps)  # [D², H, W]
    return jnp.transpose(vol, (1, 2, 0)) / c


def correlation_mxu(
    f1: jnp.ndarray,
    f2: jnp.ndarray,
    max_displacement: int = 20,
    stride: int = 2,
) -> jnp.ndarray:
    """MXU formulation: per row-displacement batched matmul + diagonal gather."""
    h, w, c = f1.shape
    pad = max_displacement
    d = 2 * (pad // stride) + 1
    f2p = jnp.pad(f2, ((pad, pad), (pad, pad), (0, 0)))

    outs = []
    for i in range(d):
        dy = i * stride  # row offset into padded f2 (dy_actual = dy − pad)
        rows2 = jax.lax.dynamic_slice(f2p, (dy, 0, 0), (h, w + 2 * pad, c))
        # [H, W, W+2p] row-correlation matrices on the MXU.
        m = jnp.einsum(
            "ywc,yvc->ywv", f1, rows2, preferred_element_type=f1.dtype
        )
        # Column displacement dx = stride·k − pad ⇒ padded column x + stride·k.
        diags = [
            jnp.diagonal(m, offset=k * stride, axis1=1, axis2=2)
            for k in range(d)
        ]
        outs.append(jnp.stack(diags, axis=-1))  # [H, W, D]
    return jnp.concatenate(outs, axis=-1) / c  # [H, W, D²] row-major (dy, dx)


def correlation(
    f1: jnp.ndarray,
    f2: jnp.ndarray,
    max_displacement: int = 20,
    stride: int = 2,
) -> jnp.ndarray:
    """Dispatching entry point; same contract as `correlation_reference`."""
    if os.environ.get("PREMVOS_PALLAS", "0") == "1":
        from premvos_tpu.ops.pallas.correlation_pallas import correlation_pallas

        return correlation_pallas(f1, f2, max_displacement, stride)
    return correlation_mxu(f1, f2, max_displacement, stride)
