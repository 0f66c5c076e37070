"""Numerical parity of torch-ResNet weight conversion: a hand-built torch
bottleneck (eval mode) must match our Bottleneck with converted weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from premvos_tpu.io_compat.convert_resnet import convert_resnet_state_dict
from premvos_tpu.models.resnet import Bottleneck, ResNet


class TorchBottleneck(torch.nn.Module):
    """torchvision-style bottleneck v1.5 (stride on the 3×3)."""

    def __init__(self, cin, width, stride=1):
        super().__init__()
        cout = width * 4
        self.conv1 = torch.nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(width)
        self.conv2 = torch.nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(width)
        self.conv3 = torch.nn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(cout)
        self.downsample = torch.nn.Sequential(
            torch.nn.Conv2d(cin, cout, 1, stride, bias=False),
            torch.nn.BatchNorm2d(cout),
        )
        self.relu = torch.nn.ReLU()

    def forward(self, x):
        idt = self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idt)


def _randomize_bn(bn, rng):
    with torch.no_grad():
        bn.weight.copy_(torch.tensor(rng.uniform(0.5, 1.5, bn.weight.shape)))
        bn.bias.copy_(torch.tensor(rng.uniform(-0.5, 0.5, bn.bias.shape)))
        bn.running_mean.copy_(
            torch.tensor(rng.uniform(-0.5, 0.5, bn.running_mean.shape))
        )
        bn.running_var.copy_(
            torch.tensor(rng.uniform(0.5, 1.5, bn.running_var.shape))
        )


def test_bottleneck_numerical_parity(rng):
    tb = TorchBottleneck(8, 4, stride=2).eval()
    for bn in (tb.bn1, tb.bn2, tb.bn3, tb.downsample[1]):
        _randomize_bn(bn, rng)

    x = rng.standard_normal((1, 8, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want = tb(torch.tensor(x)).numpy()

    fb = Bottleneck(filters=4, strides=2)
    like = fb.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 8), jnp.float32)
    )
    # Rename the torch keys into layer1.0.* form so the converter maps them.
    sd = {}
    for k, v in tb.state_dict().items():
        sd[f"layer1.0.{k}"] = v
    # Target tree: wrap `like` under stage2_block0 naming.
    wrapped = {"params": {"stage2_block0": like["params"]}}
    out = convert_resnet_state_dict(
        {k: v for k, v in sd.items() if "num_batches" not in k}, wrapped
    )
    got = fb.apply(
        {"params": out["params"]["stage2_block0"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_full_resnet50_mapping_structural(rng):
    """Synthetic torch-style state dict with the right shapes fully maps a
    ResNet-50 backbone tree (all backbone params consumed)."""
    model = ResNet(depth=50)
    like = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    blocks = {1: 3, 2: 4, 3: 6, 4: 3}
    widths = {1: 64, 2: 128, 3: 256, 4: 512}
    sd = {"conv1.weight": torch.zeros(64, 3, 7, 7)}
    for leaf, shape in [("weight", (64,)), ("bias", (64,)),
                        ("running_mean", (64,)), ("running_var", (64,))]:
        sd[f"bn1.{leaf}"] = torch.zeros(shape)
    cin = 64
    for layer, n in blocks.items():
        w = widths[layer]
        for i in range(n):
            stride_in = cin if i == 0 else w * 4
            sd[f"layer{layer}.{i}.conv1.weight"] = torch.zeros(w, stride_in, 1, 1)
            sd[f"layer{layer}.{i}.conv2.weight"] = torch.zeros(w, w, 3, 3)
            sd[f"layer{layer}.{i}.conv3.weight"] = torch.zeros(w * 4, w, 1, 1)
            for b in (1, 2):
                for leaf in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"layer{layer}.{i}.bn{b}.{leaf}"] = torch.zeros(w)
            for leaf in ("weight", "bias", "running_mean", "running_var"):
                sd[f"layer{layer}.{i}.bn3.{leaf}"] = torch.zeros(w * 4)
            if i == 0:
                sd[f"layer{layer}.{i}.downsample.0.weight"] = torch.zeros(
                    w * 4, stride_in, 1, 1
                )
                for leaf in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"layer{layer}.{i}.downsample.1.{leaf}"] = torch.zeros(w * 4)
        cin = w * 4
    out = convert_resnet_state_dict(sd, like)
    assert out["params"]["stem_conv"]["kernel"].shape == (7, 7, 3, 64)
