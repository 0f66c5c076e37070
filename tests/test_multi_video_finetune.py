import pytest
import jax
import numpy as np

from premvos_tpu.config import FinetuneConfig, RefineConfig
from premvos_tpu.finetune.multi_video import finetune_refine_videos
from premvos_tpu.models.deeplab import DeepLabV3Plus
from premvos_tpu.parallel.mesh import make_mesh


pytestmark = pytest.mark.slow


def test_video_parallel_finetune(rng):
    cfg = RefineConfig(crop_size=33, backbone_depth=26, box_margin=6.0)
    model = DeepLabV3Plus(cfg=cfg)
    params = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 33, 33, 4), np.float32)
    )

    def video(seed):
        r = np.random.default_rng(seed)
        frame = r.integers(0, 255, (64, 64, 3)).astype(np.uint8)
        labels = np.zeros((64, 64), np.int32)
        y, x = r.integers(5, 25, 2)
        labels[y : y + 25, x : x + 25] = 1
        return frame, labels

    mesh = make_mesh(2)
    ft = FinetuneConfig(num_augmentations=4, steps=3, batch_size=4,
                        learning_rate=1e-3)
    out, losses = finetune_refine_videos(
        model, params, [video(1), video(2), video(3)], mesh, cfg, ft
    )
    assert len(out) == 3 and len(losses) == 3
    assert np.isfinite(losses).all()
    # per-video params diverged from each other and from the base
    a = jax.tree.leaves(out[0])[0]
    b = jax.tree.leaves(out[1])[0]
    assert float(np.abs(np.asarray(a) - np.asarray(b)).max()) > 0
