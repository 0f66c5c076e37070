"""Parity: Pallas NMS vs the jnp reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from premvos_tpu.ops.nms import nms_reference
from premvos_tpu.ops.pallas.nms_pallas import nms_pallas
from tests.test_ops_boxes import random_boxes


def _run_both(boxes, scores, max_outputs, thr=0.5, **kw):
    a = nms_reference(jnp.array(boxes), jnp.array(scores), max_outputs, thr, **kw)
    b = nms_pallas(
        jnp.array(boxes), jnp.array(scores), max_outputs, thr,
        interpret=True, **kw,
    )
    return a, b


def test_pallas_nms_matches_reference(rng):
    for _ in range(3):
        boxes = random_boxes(rng, 48, size=60.0)
        scores = rng.uniform(0, 1, 48).astype(np.float32)
        (ia, ka), (ib, kb) = _run_both(boxes, scores, 48)
        np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
        np.testing.assert_array_equal(np.asarray(ka), np.asarray(kb))


def test_pallas_nms_truncation_and_valid(rng):
    boxes = random_boxes(rng, 32, size=500.0)
    scores = rng.uniform(0, 1, 32).astype(np.float32)
    valid = np.zeros(32, bool)
    valid[:10] = True
    (ia, ka), (ib, kb) = _run_both(
        boxes, scores, 4, valid=jnp.array(valid)
    )
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))


def test_pallas_nms_identical_boxes():
    boxes = np.tile(np.array([[0.0, 0.0, 10.0, 10.0]], np.float32), (8, 1))
    scores = np.arange(8, dtype=np.float32)
    (ia, ka), (ib, kb) = _run_both(boxes, scores, 8)
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
    assert int(np.asarray(kb).sum()) == 1


def test_nms_pallas_under_grad(rng):
    """Detection training differentiates through code paths that CALL nms
    (TPU default = the Pallas kernel). NMS outputs are integer — gradients
    must not attempt to linearize the kernel (stop_gradient in the
    dispatcher). Reproduces the TPU finetune failure of 2026-08-16."""
    import jax

    from premvos_tpu.ops.pallas.nms_pallas import nms_pallas

    boxes = jnp.asarray(rng.uniform(0, 64, (16, 4)), jnp.float32)
    boxes = boxes.at[:, 2:].set(boxes[:, :2] + 5.0)
    scores0 = jnp.asarray(rng.uniform(0, 1, (16,)), jnp.float32)

    def loss(s):
        idx, keep = nms_pallas(
            jax.lax.stop_gradient(boxes), jax.lax.stop_gradient(s),
            max_outputs=4, interpret=True,
        )
        picked = s[jnp.maximum(idx, 0)] * keep
        return jnp.sum(picked)

    g = jax.grad(loss)(scores0)
    assert np.isfinite(np.asarray(g)).all()
