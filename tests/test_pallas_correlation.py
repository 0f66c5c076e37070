"""Parity tests for the Pallas correlation kernel (interpret mode on CPU;
the same kernel compiles for real on TPU — exercised by bench/verify)."""

import jax.numpy as jnp
import numpy as np

from premvos_tpu.ops.correlation import correlation_reference
from premvos_tpu.ops.pallas.correlation_pallas import correlation_pallas


def test_pallas_correlation_matches_reference(rng):
    f1 = jnp.array(rng.standard_normal((10, 12, 8)), jnp.float32)
    f2 = jnp.array(rng.standard_normal((10, 12, 8)), jnp.float32)
    want = np.asarray(correlation_reference(f1, f2, 4, 2))
    got = np.asarray(
        correlation_pallas(f1, f2, 4, 2, block_rows=4, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pallas_correlation_ragged_rows(rng):
    # H not divisible by block_rows exercises the padded tail block.
    f1 = jnp.array(rng.standard_normal((7, 6, 4)), jnp.float32)
    f2 = jnp.array(rng.standard_normal((7, 6, 4)), jnp.float32)
    want = np.asarray(correlation_reference(f1, f2, 2, 2))
    got = np.asarray(
        correlation_pallas(f1, f2, 2, 2, block_rows=4, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pallas_correlation_stride1(rng):
    f1 = jnp.array(rng.standard_normal((6, 6, 4)), jnp.float32)
    f2 = jnp.array(rng.standard_normal((6, 6, 4)), jnp.float32)
    want = np.asarray(correlation_reference(f1, f2, 2, 1))
    got = np.asarray(
        correlation_pallas(f1, f2, 2, 1, block_rows=2, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
