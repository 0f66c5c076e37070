import jax
import jax.numpy as jnp
import numpy as np
import pytest

from premvos_tpu.train.detection import (
    assign_roi_targets,
    assign_rpn_targets,
    detection_loss,
    mask_targets,
    maskrcnn_loss_fn,
    rpn_loss,
)


def test_assign_rpn_targets_basic():
    anchors = jnp.array(
        [[0, 0, 10, 10], [0, 0, 9, 11], [50, 50, 60, 60], [100, 100, 110, 110]],
        jnp.float32,
    )
    gt = jnp.array([[0, 0, 10, 10]], jnp.float32)
    labels, tgts = assign_rpn_targets(
        anchors, gt, jnp.array([True]), jax.random.PRNGKey(0),
        num_samples=4, pos_fraction=0.5,
    )
    lab = np.asarray(labels)
    assert lab[0] == 1  # exact match is positive
    assert lab[2] == 0 and lab[3] == 0  # far anchors negative
    # targets for the positive anchor are ~zero deltas
    np.testing.assert_allclose(np.asarray(tgts[0]), 0.0, atol=1e-5)


def test_assign_rpn_best_anchor_forced_positive():
    # No anchor reaches 0.7 IoU, but the best one must still be positive.
    anchors = jnp.array([[0, 0, 20, 20], [40, 40, 60, 60]], jnp.float32)
    gt = jnp.array([[0, 0, 10, 10]], jnp.float32)
    labels, _ = assign_rpn_targets(
        anchors, gt, jnp.array([True]), jax.random.PRNGKey(0), num_samples=2
    )
    assert int(labels[0]) == 1


def test_rpn_loss_perfect():
    logits = jnp.array([10.0, -10.0])
    deltas = jnp.zeros((2, 4))
    labels = jnp.array([1, 0])
    tgts = jnp.zeros((2, 4))
    cls, box = rpn_loss(logits, deltas, labels, tgts)
    assert float(cls) < 1e-3 and float(box) == 0.0


def test_assign_roi_and_mask_targets():
    props = jnp.array([[0, 0, 10, 10], [30, 30, 40, 40]], jnp.float32)
    gt_boxes = jnp.array([[0, 0, 10, 10]], jnp.float32)
    gt_masks = jnp.zeros((1, 48, 48)).at[0, 0:10, 0:10].set(1.0)
    cls, matched, tgts, fg, valid = assign_roi_targets(
        props, jnp.array([True, True]), gt_boxes, jnp.array([True])
    )
    assert int(cls[0]) == 1 and int(cls[1]) == 0
    m = mask_targets(gt_masks, matched, props, 14, (48, 48))
    assert m.shape == (2, 14, 14)
    # proposal 0 covers its GT (edge samples land on the boundary → ~0.83)
    assert float(m[0].mean()) > 0.8
    assert float(m[1].mean()) < 0.05  # proposal 1 is off the object


@pytest.mark.slow
def test_maskrcnn_train_step_decreases_loss():
    import optax

    from premvos_tpu.models.anchors import pyramid_anchors
    from premvos_tpu.models.maskrcnn import MaskRCNN
    from tests.test_maskrcnn import TINY

    model = MaskRCNN(cfg=TINY)
    anchors = {
        k: jnp.array(v)
        for k, v in pyramid_anchors(
            64, 64, TINY.anchor_scales, TINY.anchor_ratios
        ).items()
    }
    img = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), img, anchors)

    rng = np.random.default_rng(0)
    images = jnp.array(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    gt_boxes = jnp.array([[[8.0, 8.0, 30.0, 30.0]]])
    gt_masks = jnp.zeros((1, 1, 64, 64)).at[:, :, 8:30, 8:30].set(1.0)
    gt_valid = jnp.array([[True]])
    batch = (images, gt_boxes, gt_masks, gt_valid)

    loss_fn = maskrcnn_loss_fn(model, anchors, TINY, (64, 64), jax.random.PRNGKey(1))
    tx = optax.adam(1e-4)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        l, g = jax.value_and_grad(loss_fn)(p, batch)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, l

    losses = []
    for _ in range(4):
        params, opt, l = step(params, opt)
        losses.append(float(l))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
