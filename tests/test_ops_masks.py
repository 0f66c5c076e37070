import jax
import jax.numpy as jnp
import numpy as np

from premvos_tpu.ops.masks import mask_iou, paste_mask, soft_mask_iou


def test_mask_iou_exact(rng):
    a = (rng.uniform(0, 1, (3, 16, 16)) > 0.5).astype(np.float32)
    b = (rng.uniform(0, 1, (4, 16, 16)) > 0.5).astype(np.float32)
    got = np.asarray(mask_iou(jnp.array(a), jnp.array(b)))
    for i in range(3):
        for j in range(4):
            inter = (a[i] * b[j]).sum()
            union = a[i].sum() + b[j].sum() - inter
            np.testing.assert_allclose(got[i, j], inter / union, rtol=1e-5)


def test_soft_mask_iou_binary_agrees(rng):
    a = (rng.uniform(0, 1, (2, 12, 12)) > 0.5).astype(np.float32)
    b = (rng.uniform(0, 1, (2, 12, 12)) > 0.5).astype(np.float32)
    hard = np.asarray(mask_iou(jnp.array(a), jnp.array(b), threshold=0.5))
    soft = np.asarray(soft_mask_iou(jnp.array(a), jnp.array(b)))
    np.testing.assert_allclose(hard, soft, rtol=1e-5)


def test_paste_mask_full_coverage():
    # A full-ones mask pasted over a box covers exactly that box's pixels.
    m = jnp.ones((4, 4))
    box = jnp.array([2.0, 3.0, 10.0, 9.0])
    out = np.asarray(paste_mask(m, box, 16, 16))
    assert out[6, 6] == 1.0  # box interior
    assert out[0, 0] == 0.0  # outside
    assert out[12, 12] == 0.0
    # Total mass ≈ box area.
    np.testing.assert_allclose(out.sum(), 8 * 6, rtol=0.15)


def test_paste_mask_batched(rng):
    masks = jnp.array(rng.uniform(0, 1, (3, 8, 8)), jnp.float32)
    boxes = jnp.array(
        [[0.0, 0.0, 8.0, 8.0], [4.0, 4.0, 12.0, 12.0], [1.0, 2.0, 5.0, 9.0]]
    )
    out = jax.vmap(paste_mask, in_axes=(0, 0, None, None))(masks, boxes, 16, 16)
    assert out.shape == (3, 16, 16)
    assert np.isfinite(np.asarray(out)).all()
