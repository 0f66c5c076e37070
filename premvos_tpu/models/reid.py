"""Triplet-ReID embedding network (SURVEY.md C4).

Reference: the OnAVOS-family `ReID_net/` (unverified — mount was empty),
a ResNet-style backbone with a small embedding head trained with batch-hard
triplet loss ("In Defense of the Triplet Loss", Hermans et al.) on COCO/
PASCAL object crops. At inference it embeds every proposal crop and every
first-frame GT crop into a ~128-d space; the merge stage scores proposals by
embedding distance to each object's reference embedding.

TPU notes: crops arrive as fixed-size batches [N, S, S, 3]; the whole stage
is one dense batched conv net. Pairwise distances are a single MXU matmul
(premvos_tpu.stages.reid.pairwise_distances).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from premvos_tpu.config import ReIDConfig
from premvos_tpu.models.resnet import ResNet


class ReIDNet(nn.Module):
    cfg: ReIDConfig = ReIDConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, crops: jnp.ndarray) -> jnp.ndarray:
        """[N, S, S, 3] crops → [N, E] embeddings (not L2-normalized;
        the triplet loss operates on raw Euclidean distances)."""
        feats = ResNet(
            depth=self.cfg.backbone_depth, dtype=self.dtype,
            norm=self.cfg.norm, name="backbone",
        )(crops.astype(self.dtype))
        x = jnp.mean(feats["C5"], axis=(-3, -2))  # global average pool
        x = nn.relu(nn.Dense(1024, dtype=self.dtype, name="fc1")(x))
        emb = nn.Dense(self.cfg.embedding_dim, dtype=self.dtype, name="emb")(x)
        emb = emb.astype(jnp.float32)
        if self.cfg.l2_normalize:
            # Train AND infer on the unit sphere so identity must live in
            # the embedding direction (ReIDConfig.l2_normalize docs).
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-6
            )
        return emb
