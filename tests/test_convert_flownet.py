"""Numerical validation of torch→flax layer conversion, plus the full
FlowNet2 state-dict mapping on a synthetic checkpoint."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from premvos_tpu.io_compat.convert_flownet import (
    conv_kernel,
    convert_flownet2_state_dict,
    convtranspose_kernel,
)


def test_conv2d_numerical_parity(rng):
    tconv = torch.nn.Conv2d(3, 8, 5, stride=2, padding=2)
    x = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want = tconv(torch.tensor(x)).numpy()

    import flax.linen as nn

    fconv = nn.Conv(8, (5, 5), strides=(2, 2), padding=[(2, 2), (2, 2)])
    params = {
        "params": {
            "kernel": jnp.asarray(conv_kernel(tconv.weight.detach().numpy())),
            "bias": jnp.asarray(tconv.bias.detach().numpy()),
        }
    }
    got = fconv.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_convtranspose2d_numerical_parity(rng):
    tdeconv = torch.nn.ConvTranspose2d(6, 4, 4, stride=2, padding=1)
    x = rng.standard_normal((1, 6, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want = tdeconv(torch.tensor(x)).numpy()

    import flax.linen as nn

    fdeconv = nn.ConvTranspose(4, (4, 4), strides=(2, 2), padding="SAME")
    params = {
        "params": {
            "kernel": jnp.asarray(
                convtranspose_kernel(tdeconv.weight.detach().numpy())
            ),
            "bias": jnp.asarray(tdeconv.bias.detach().numpy()),
        }
    }
    got = fdeconv.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_full_state_dict_mapping(rng):
    """Synthesize a flownet2-pytorch-shaped state dict from our own param
    tree and check the converter rebuilds it exactly (all keys consumed,
    layouts inverted correctly)."""
    from premvos_tpu.models import FlowNet2

    model = FlowNet2(variant="flownet2", max_displacement=4)
    x = jnp.zeros((1, 64, 64, 3))
    like = model.init(jax.random.PRNGKey(0), x, x)

    # Build the torch-style state dict by inverting our mapping.
    sd = {}
    flat = jax.tree_util.tree_flatten_with_path(like)[0]
    for kp, v in flat:
        path = [str(k.key) for k in kp]  # ['params', net, ...]
        v = np.asarray(v)
        net = path[1]
        if path[2] == "decoder":
            layer, kind, leaf = path[3], path[4], path[5]
            if kind == "ConvTranspose_0":
                key = f"{net}.{layer}.0.weight" if layer.startswith("deconv") else f"{net}.{layer}.weight"
                if leaf == "kernel":
                    w = np.transpose(v[::-1, ::-1], (2, 3, 0, 1))
                    sd[key] = torch.tensor(w.copy())
                else:
                    sd[key.replace("weight", "bias")] = torch.tensor(v)
            else:  # predict_flow Conv
                key = f"{net}.{layer}.weight"
                if leaf == "kernel":
                    sd[key] = torch.tensor(np.transpose(v, (3, 2, 0, 1)).copy())
                else:
                    sd[key.replace("weight", "bias")] = torch.tensor(v)
        else:
            if path[2] == "encoder":
                layer, leaf = path[3], path[5]
            else:
                layer, leaf = path[2], path[4]
            key = f"{net}.{layer}.0.weight"
            if leaf == "kernel":
                sd[key] = torch.tensor(np.transpose(v, (3, 2, 0, 1)).copy())
            else:
                sd[key.replace("weight", "bias")] = torch.tensor(v)

    tree, unused = convert_flownet2_state_dict(sd, like)
    assert unused == []
    got_flat = {
        tuple(str(k.key) for k in kp): v
        for kp, v in jax.tree_util.tree_flatten_with_path(tree)[0]
    }
    for kp, v in flat:
        key = tuple(str(k.key) for k in kp)
        np.testing.assert_allclose(
            np.asarray(got_flat[key]), np.asarray(v), rtol=1e-6,
            err_msg=str(key),
        )


def test_shape_mismatch_raises():
    from premvos_tpu.models import FlowNet2

    model = FlowNet2(variant="flownetc", max_displacement=4)
    x = jnp.zeros((1, 64, 64, 3))
    # Only leaf SHAPES matter to the converter's mismatch check — eval_shape
    # skips the init compile (was ~52 s of the fast suite).
    like = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, x)
    sd = {"flownetc.conv1.0.weight": torch.zeros(64, 3, 7, 7)}
    with pytest.raises(ValueError):
        convert_flownet2_state_dict(sd, like)
