"""Xception-65 refinement-encoder option + trainable-norm option.

The PReMVOS paper's refinement net is DeepLabv3+ on Xception-65 (paper
§3.2); `RefineConfig.backbone="xception65"` provides structural parity
while ResNet stays the TPU-preferred default. `norm="group_norm"` is the
from-scratch-training regime (frozen BN would train through identity
statistics).
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from premvos_tpu.config import RefineConfig, ReIDConfig
from premvos_tpu.models.deeplab import DeepLabV3Plus
from premvos_tpu.models.resnet import GroupNorm32, ResNet
from premvos_tpu.models.xception import Xception65


def test_xception_feature_strides():
    model = Xception65(output_stride=16)
    x = jnp.zeros((1, 64, 64, 4))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    feats = jax.jit(model.apply)(params, x)
    assert feats["C2"].shape[1:3] == (16, 16)  # stride 4
    assert feats["C5"].shape[1:3] == (4, 4)  # stride 16
    assert feats["C5"].shape[-1] == 2048


@pytest.mark.slow
def test_deeplab_xception_backbone():
    cfg = RefineConfig(crop_size=33, backbone="xception65")
    model = DeepLabV3Plus(cfg=cfg)
    x = jnp.zeros((2, 33, 33, 4))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    logits = jax.jit(model.apply)(params, x)
    assert logits.shape == (2, 33, 33)
    assert np.isfinite(np.asarray(logits)).all()


def test_group_norm_option_trains_normalization():
    """group_norm swaps every FrozenBatchNorm for a trainable GroupNorm —
    no frozen statistics anywhere in the tree."""
    model = ResNet(depth=26, norm="group_norm")
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = ["/".join(str(k.key) for k in kp) for kp, _ in flat]
    assert not any("FrozenBatchNorm" in n for n in names)
    assert any("GroupNorm32" in n for n in names)
    # every GroupNorm param is trainable (scale/bias only, no mean/var)
    assert not any(n.endswith(("/mean", "/var")) for n in names)


def test_group_norm_groups_divide_channels():
    gn = GroupNorm32()
    for c in (48, 64, 256, 30):
        x = jnp.ones((1, 4, 4, c))
        p = gn.init(jax.random.PRNGKey(0), x)
        y = gn.apply(p, x)
        assert y.shape == x.shape


def test_reid_group_norm_forward():
    from premvos_tpu.models.reid import ReIDNet

    model = ReIDNet(cfg=ReIDConfig(backbone_depth=26, embedding_dim=8,
                                   crop_size=32, norm="group_norm"))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    emb = jax.jit(model.apply)(params, jnp.ones((3, 32, 32, 3)))
    assert emb.shape == (3, 8)
    assert np.isfinite(np.asarray(emb)).all()
