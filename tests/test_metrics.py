import jax.numpy as jnp
import numpy as np
import pytest

from premvos_tpu.eval.metrics import (
    binary_iou,
    embedding_retrieval_accuracy,
    pixel_accuracy,
)


def test_pixel_accuracy():
    logits = jnp.array([[10.0, -10.0], [10.0, 10.0]])
    labels = jnp.array([[1.0, 0.0], [1.0, 0.0]])
    assert float(pixel_accuracy(logits, labels)) == pytest.approx(0.75)


def test_binary_iou_perfect_and_disjoint():
    logits = jnp.zeros((1, 4, 4)).at[0, :2].set(10.0).at[0, 2:].set(-10.0)
    labels = jnp.zeros((1, 4, 4)).at[0, :2].set(1.0)
    assert float(binary_iou(logits, labels, eps=0.0)) == 1.0
    flipped = 1.0 - labels
    assert float(binary_iou(logits, flipped, eps=0.0)) == 0.0


def test_retrieval_accuracy():
    emb = jnp.array([[0.0, 0.0], [0.1, 0.0], [5.0, 5.0], [5.1, 5.0]])
    ids = jnp.array([0, 0, 1, 1])
    assert float(embedding_retrieval_accuracy(emb, ids)) == 1.0
    bad_ids = jnp.array([0, 1, 0, 1])
    assert float(embedding_retrieval_accuracy(emb, bad_ids)) == 0.0
