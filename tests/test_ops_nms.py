import jax.numpy as jnp
import numpy as np

from premvos_tpu.ops import nms_reference
from tests.test_ops_boxes import numpy_iou, random_boxes


def numpy_nms(boxes, scores, iou_threshold):
    order = np.argsort(-scores, kind="stable")
    kept = []
    suppressed = np.zeros(len(boxes), bool)
    iou = numpy_iou(boxes, boxes)
    for i in order:
        if suppressed[i]:
            continue
        kept.append(i)
        suppressed |= iou[i] > iou_threshold
        suppressed[i] = True  # self-iou is 1; keep it marked processed
    return kept


def test_nms_matches_numpy(rng):
    for trial in range(5):
        boxes = random_boxes(rng, 64, size=60.0)  # crowded → many overlaps
        scores = rng.uniform(0, 1, 64).astype(np.float32)
        idx, keep = nms_reference(
            jnp.array(boxes), jnp.array(scores), max_outputs=64, iou_threshold=0.5
        )
        got = [int(i) for i, k in zip(np.asarray(idx), np.asarray(keep)) if k]
        assert got == numpy_nms(boxes, scores, 0.5)


def test_nms_max_outputs_truncates(rng):
    boxes = random_boxes(rng, 32, size=1000.0)  # spread out → few overlaps
    scores = rng.uniform(0, 1, 32).astype(np.float32)
    idx, keep = nms_reference(
        jnp.array(boxes), jnp.array(scores), max_outputs=5, iou_threshold=0.5
    )
    assert idx.shape == (5,)
    full = numpy_nms(boxes, scores, 0.5)
    got = [int(i) for i, k in zip(np.asarray(idx), np.asarray(keep)) if k]
    assert got == full[:5]


def test_nms_respects_valid_mask_and_score_threshold(rng):
    boxes = random_boxes(rng, 16, size=1000.0)
    scores = rng.uniform(0.1, 1, 16).astype(np.float32)
    valid = np.zeros(16, bool)
    valid[:4] = True
    idx, keep = nms_reference(
        jnp.array(boxes),
        jnp.array(scores),
        max_outputs=16,
        iou_threshold=0.5,
        valid=jnp.array(valid),
    )
    got = set(int(i) for i, k in zip(np.asarray(idx), np.asarray(keep)) if k)
    assert got <= {0, 1, 2, 3}

    idx2, keep2 = nms_reference(
        jnp.array(boxes), jnp.array(scores), 16, 0.5, score_threshold=2.0
    )
    assert not bool(np.asarray(keep2).any())


def test_nms_identical_boxes_keeps_one():
    boxes = jnp.tile(jnp.array([[0.0, 0.0, 10.0, 10.0]]), (8, 1))
    scores = jnp.arange(8, dtype=jnp.float32)
    idx, keep = nms_reference(boxes, scores, max_outputs=8, iou_threshold=0.5)
    assert int(np.asarray(keep).sum()) == 1
    assert int(np.asarray(idx)[0]) == 7  # highest score wins
