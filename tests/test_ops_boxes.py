import jax.numpy as jnp
import numpy as np

from premvos_tpu.ops import (
    box_area,
    box_iou,
    clip_boxes,
    decode_boxes,
    encode_boxes,
)


def random_boxes(rng, n, size=100.0):
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(1, size / 2, (n, 2))
    return np.concatenate([xy, xy + wh], -1).astype(np.float32)


def numpy_iou(a, b):
    out = np.zeros((len(a), len(b)), np.float32)
    for i, bi in enumerate(a):
        for j, bj in enumerate(b):
            ix1, iy1 = max(bi[0], bj[0]), max(bi[1], bj[1])
            ix2, iy2 = min(bi[2], bj[2]), min(bi[3], bj[3])
            inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
            ua = (bi[2] - bi[0]) * (bi[3] - bi[1])
            ub = (bj[2] - bj[0]) * (bj[3] - bj[1])
            out[i, j] = inter / (ua + ub - inter)
    return out


def test_box_iou_matches_numpy(rng):
    a, b = random_boxes(rng, 13), random_boxes(rng, 7)
    got = np.asarray(box_iou(jnp.array(a), jnp.array(b)))
    np.testing.assert_allclose(got, numpy_iou(a, b), rtol=1e-5, atol=1e-6)


def test_encode_decode_roundtrip(rng):
    anchors = random_boxes(rng, 32)
    boxes = random_boxes(rng, 32)
    deltas = encode_boxes(jnp.array(boxes), jnp.array(anchors))
    rec = decode_boxes(deltas, jnp.array(anchors))
    np.testing.assert_allclose(np.asarray(rec), boxes, rtol=1e-4, atol=1e-3)


def test_clip_and_area():
    b = jnp.array([[-5.0, -5.0, 50.0, 120.0]])
    c = clip_boxes(b, 100, 100)
    np.testing.assert_allclose(np.asarray(c), [[0, 0, 50, 100]])
    assert float(box_area(c)[0]) == 5000.0
