"""ChannelNorm: per-pixel L2 norm across channels.

Reference: the CUDA `channelnorm_package` in the flownet2 fork
(optical_flow_net/networks/channelnorm_package/, unverified — reference mount
was empty; see SURVEY.md). Feeds the FlowNet2 fusion network with brightness-
error magnitudes. Trivially a fused VPU expression on TPU — kept as a named op
so stage code and parity tests mirror the reference op-for-op.
"""

from __future__ import annotations

import jax.numpy as jnp


def channelnorm(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """[..., C] → [..., 1] L2 norm over the channel axis."""
    return jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)
