"""Custom-VJP correlation: gradients vs autodiff of the reference impl."""

import jax
import jax.numpy as jnp
import numpy as np

from premvos_tpu.ops.correlation import (
    correlation,
    correlation_mxu,
    correlation_reference,
)


def test_batched_forward_matches(rng):
    f1 = jnp.array(rng.standard_normal((2, 6, 7, 4)), jnp.float32)
    f2 = jnp.array(rng.standard_normal((2, 6, 7, 4)), jnp.float32)
    a = np.asarray(correlation_reference(f1, f2, 2, 2))
    b = np.asarray(correlation_mxu(f1, f2, 2, 2))
    c = np.asarray(correlation(f1, f2, 2, 2))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(a, c, rtol=1e-4, atol=1e-5)


def test_custom_vjp_matches_autodiff(rng):
    f1 = jnp.array(rng.standard_normal((5, 6, 3)), jnp.float32)
    f2 = jnp.array(rng.standard_normal((5, 6, 3)), jnp.float32)
    g = jnp.array(rng.standard_normal((5, 6, 9)), jnp.float32)

    def loss_custom(a, b):
        return jnp.sum(correlation(a, b, 2, 2) * g)

    def loss_ref(a, b):
        return jnp.sum(correlation_reference(a, b, 2, 2) * g)

    d1c, d2c = jax.grad(loss_custom, argnums=(0, 1))(f1, f2)
    d1r, d2r = jax.grad(loss_ref, argnums=(0, 1))(f1, f2)
    np.testing.assert_allclose(np.asarray(d1c), np.asarray(d1r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2c), np.asarray(d2r), rtol=1e-4, atol=1e-5)


def test_custom_vjp_batched_grad(rng):
    f1 = jnp.array(rng.standard_normal((2, 4, 4, 3)), jnp.float32)
    f2 = jnp.array(rng.standard_normal((2, 4, 4, 3)), jnp.float32)

    def loss(a, b):
        return jnp.sum(correlation(a, b, 2, 2) ** 2)

    d1, d2 = jax.grad(loss, argnums=(0, 1))(f1, f2)
    d1r, d2r = jax.grad(
        lambda a, b: jnp.sum(correlation_reference(a, b, 2, 2) ** 2),
        argnums=(0, 1),
    )(f1, f2)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d1r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d2r), rtol=1e-4, atol=1e-5)
