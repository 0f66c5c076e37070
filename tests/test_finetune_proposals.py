import pytest
import jax
import jax.numpy as jnp
import numpy as np

from premvos_tpu.config import FinetuneConfig
from premvos_tpu.finetune.finetune import finetune_proposals, labels_to_boxes_masks
from premvos_tpu.models.anchors import pyramid_anchors
from premvos_tpu.models.maskrcnn import MaskRCNN
from premvos_tpu.parallel.mesh import make_mesh
from tests.test_maskrcnn import TINY


pytestmark = pytest.mark.slow


def test_labels_to_boxes_masks():
    lab = np.zeros((16, 16), np.int32)
    lab[2:6, 3:9] = 1
    lab[10:14, 10:12] = 3
    boxes, masks, valid = labels_to_boxes_masks(lab, 4)
    np.testing.assert_array_equal(boxes[0], [3, 2, 9, 6])
    np.testing.assert_array_equal(boxes[1], [10, 10, 12, 14])
    assert valid[:2].all() and not valid[2:].any()
    assert masks[0].sum() == 24


def test_finetune_proposals_runs():
    model = MaskRCNN(cfg=TINY)
    anchors = {
        k: jnp.array(v)
        for k, v in pyramid_anchors(
            64, 64, TINY.anchor_scales, TINY.anchor_ratios
        ).items()
    }
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), anchors
    )
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    labels = np.zeros((64, 64), np.int32)
    labels[20:40, 20:40] = 1
    mesh = make_mesh(2)
    ft = FinetuneConfig(num_augmentations=4, steps=3, batch_size=2,
                        learning_rate=1e-4)
    new_params, loss = finetune_proposals(
        model, params, anchors, TINY, frame, labels, mesh, ft, max_objects=2
    )
    assert np.isfinite(loss)
    diff = jax.tree.map(
        lambda a, b: float(abs(np.asarray(a) - np.asarray(b)).max()),
        params, new_params,
    )
    assert max(jax.tree.leaves(diff)) > 0
