import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from premvos_tpu.parallel.mesh import make_mesh
from premvos_tpu.train.losses import (
    batch_hard_triplet,
    endpoint_error,
    multiscale_epe,
    sigmoid_xent,
    smooth_l1,
    softmax_xent,
)
from premvos_tpu.train.trainer import (
    create_train_state,
    make_dp_train_step,
    replicate_state,
    shard_train_batch,
)


def test_sigmoid_xent_perfect_prediction():
    logits = jnp.array([100.0, -100.0])
    labels = jnp.array([1.0, 0.0])
    assert float(sigmoid_xent(logits, labels)) < 1e-6


def test_softmax_xent_matches_numpy(rng):
    logits = jnp.array(rng.standard_normal((5, 3)), jnp.float32)
    labels = jnp.array([0, 1, 2, 1, 0])
    got = float(softmax_xent(logits, labels))
    lp = np.asarray(jax.nn.log_softmax(logits))
    want = -np.mean([lp[i, l] for i, l in enumerate(np.asarray(labels))])
    assert got == pytest.approx(want, rel=1e-5)


def test_smooth_l1_regimes():
    # Small error → quadratic; large → linear.
    beta = 1.0 / 9.0
    small = float(smooth_l1(jnp.zeros((1, 1)), jnp.full((1, 1), 0.01), beta))
    assert small == pytest.approx(0.5 * 0.01**2 / beta, rel=1e-4)
    large = float(smooth_l1(jnp.zeros((1, 1)), jnp.full((1, 1), 2.0), beta))
    assert large == pytest.approx(2.0 - 0.5 * beta, rel=1e-5)


def test_batch_hard_triplet():
    # Two identities, clearly separated → zero loss with small margin.
    emb = jnp.array([[0.0, 0.0], [0.1, 0.0], [5.0, 5.0], [5.1, 5.0]])
    ids = jnp.array([0, 0, 1, 1])
    assert float(batch_hard_triplet(emb, ids, margin=0.2)) == 0.0
    # Collapsed embeddings → loss ≈ margin.
    emb2 = jnp.zeros((4, 2))
    assert float(batch_hard_triplet(emb2, ids, margin=0.2)) == pytest.approx(0.2)


def test_batch_hard_triplet_mask():
    emb = jnp.array([[0.0, 0.0], [0.1, 0.0], [5.0, 5.0], [99.0, 99.0]])
    ids = jnp.array([0, 0, 1, 0])
    full = batch_hard_triplet(emb, ids, 0.2)
    masked = batch_hard_triplet(emb, ids, 0.2, mask=jnp.array([1, 1, 1, 0], bool))
    assert float(masked) <= float(full) + 1e-6


def test_endpoint_error():
    pred = jnp.zeros((2, 4, 4, 2))
    target = jnp.ones((2, 4, 4, 2)) * jnp.array([3.0, 4.0])
    assert float(endpoint_error(pred, target)) == pytest.approx(5.0, rel=1e-5)


def test_multiscale_epe_runs(rng):
    target = jnp.array(rng.standard_normal((1, 16, 16, 2)), jnp.float32)
    preds = [jnp.zeros((1, 4, 4, 2)), jnp.zeros((1, 8, 8, 2))]
    loss = multiscale_epe(preds, target)
    assert float(loss) > 0


def test_dp_train_step_on_mesh():
    """Linear regression trained data-parallel on the 8-device CPU mesh must
    match the single-device result exactly (pmean of shard grads == full
    batch grad)."""
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    w_true = np.array([2.0, -3.0], np.float32)
    x = rng.standard_normal((64, 2)).astype(np.float32)
    y = x @ w_true

    def loss_fn(params, batch):
        xb, yb = batch
        pred = xb @ params["w"]
        return jnp.mean((pred - yb) ** 2)

    tx = optax.sgd(0.1)
    params = {"w": jnp.zeros(2)}
    state = replicate_state(create_train_state(params, tx), mesh)
    step = make_dp_train_step(loss_fn, tx, mesh)

    batch = shard_train_batch((jnp.array(x), jnp.array(y)), mesh)
    losses = []
    for _ in range(50):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert losses[-1] < 1e-3
    np.testing.assert_allclose(np.asarray(state.params["w"]), w_true, atol=0.05)

    # parity vs single-device full-batch training
    p1 = {"w": jnp.zeros(2)}
    o1 = tx.init(p1)
    for _ in range(50):
        g = jax.grad(loss_fn)(p1, (jnp.array(x), jnp.array(y)))
        up, o1 = tx.update(g, o1, p1)
        p1 = optax.apply_updates(p1, up)
    np.testing.assert_allclose(
        np.asarray(state.params["w"]), np.asarray(p1["w"]), rtol=1e-5
    )
