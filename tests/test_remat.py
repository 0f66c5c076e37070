import pytest
import jax
import jax.numpy as jnp
import numpy as np

from premvos_tpu.models.resnet import ResNet


@pytest.mark.slow
def test_remat_same_forward_and_grad(rng):
    x = jnp.array(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    plain = ResNet(depth=50)
    remat = ResNet(depth=50, remat=True)
    params = plain.init(jax.random.PRNGKey(0), x)

    f_plain = lambda p: jnp.sum(plain.apply(p, x)["C5"] ** 2)
    f_remat = lambda p: jnp.sum(remat.apply(p, x)["C5"] ** 2)
    np.testing.assert_allclose(
        float(f_plain(params)), float(f_remat(params)), rtol=1e-5
    )
    g1 = jax.grad(f_plain)(params)
    g2 = jax.grad(f_remat)(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)
