import jax
import jax.numpy as jnp
import numpy as np
import pytest

from premvos_tpu.config import RefineConfig, ReIDConfig
from premvos_tpu.models import DeepLabV3Plus, FlowNet2, ReIDNet, ResNet


def test_resnet_feature_strides(rng):
    # depth 26 shares the stage/stride/width layout of 50/101 (bottleneck
    # widths are depth-independent) and keeps the fast suite under budget;
    # the full depth-50 variant runs under -m slow below.
    model = ResNet(depth=26)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(params, x)
    assert feats["C2"].shape == (1, 16, 16, 256)
    assert feats["C3"].shape == (1, 8, 8, 512)
    assert feats["C4"].shape == (1, 4, 4, 1024)
    assert feats["C5"].shape == (1, 2, 2, 2048)


@pytest.mark.slow
def test_resnet50_feature_strides(rng):
    # eager init: a plain conv stack inits faster eagerly than the XLA
    # compile of its init graph on CPU (10.6 s vs 53 s measured)
    model = ResNet(depth=50)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(params, x)
    assert feats["C2"].shape == (1, 16, 16, 256)
    assert feats["C5"].shape == (1, 2, 2, 2048)


def test_resnet_dilated_os16():
    model = ResNet(depth=26, output_stride=16)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)  # eager: see above
    feats = model.apply(params, x)
    assert feats["C5"].shape == (1, 4, 4, 2048)  # same stride as C4


def test_deeplab_refine_shapes(rng):
    cfg = RefineConfig(crop_size=65, backbone_depth=26)
    model = DeepLabV3Plus(cfg=cfg)
    crops = jnp.array(rng.standard_normal((3, 65, 65, 4)), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), crops)
    logits = model.apply(params, crops)
    assert logits.shape == (3, 65, 65)
    assert bool(jnp.isfinite(logits).all())


@pytest.mark.parametrize(
    "variant,",
    [
        "flownetc",
        # the full 5-net stack is a multi-30s compile — slow suite
        pytest.param("flownet2", marks=pytest.mark.slow),
    ],
)
def test_flownet_variants(rng, variant):
    model = FlowNet2(variant=variant, max_displacement=4, corr_stride=2)
    img1 = jnp.array(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    img2 = jnp.array(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img1, img2)
    flow = model.apply(params, img1, img2)
    assert flow.shape == (1, 64, 64, 2)
    assert flow.dtype == jnp.float32
    assert bool(jnp.isfinite(flow).all())


def test_reid_embeddings(rng):
    cfg = ReIDConfig(backbone_depth=26, embedding_dim=16, crop_size=32)
    model = ReIDNet(cfg=cfg)
    crops = jnp.array(rng.standard_normal((5, 32, 32, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), crops)  # eager: see above
    emb = model.apply(params, crops)
    assert emb.shape == (5, 16)
    assert bool(jnp.isfinite(emb).all())
    # different crops → different embeddings
    assert float(jnp.abs(emb[0] - emb[1]).sum()) > 0


def test_reid_l2_normalize(rng):
    """ReIDConfig.l2_normalize=True puts embeddings on the unit sphere
    (train + inference; see docs/SELECTION_DIAGNOSIS.md for why raw
    embeddings can hide identity in magnitude)."""
    cfg = ReIDConfig(backbone_depth=26, embedding_dim=16, crop_size=32,
                     l2_normalize=True)
    model = ReIDNet(cfg=cfg)
    crops = jnp.array(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), crops)
    emb = model.apply(params, crops)
    norms = jnp.linalg.norm(emb, axis=-1)
    assert bool(jnp.allclose(norms, 1.0, atol=1e-4))
