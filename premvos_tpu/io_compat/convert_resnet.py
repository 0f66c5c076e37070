"""torch ResNet state-dict → premvos_tpu ResNet backbone params.

The reference's backbones descend from ImageNet-pretrained ResNets (TF Mask
R-CNN and the OnAVOS-family nets; SURVEY.md C19). This converter ingests the
standard torch/torchvision ResNet v1.5 naming (`conv1`, `bn1`,
`layer{1-4}.{i}.conv{1-3}/bn{1-3}/downsample`) — the most portable
pretrained format — into our FrozenBatchNorm backbone:

  conv1            → stem_conv/kernel
  bn1              → FrozenBatchNorm_0/{scale,bias,mean,var}
  layerL.i.convN   → stage{L+1}_block{i}/Conv_{N−1}/kernel
  layerL.i.bnN     → stage{L+1}_block{i}/FrozenBatchNorm_{N−1}/…
  layerL.i.downsample.0 / .1 → …/proj/kernel, …/FrozenBatchNorm_3/…

Numerically validated against a hand-built torch bottleneck in
tests/test_convert_resnet.py. Use `prefix` to target a nested backbone
(e.g. prefix=("backbone",) for MaskRCNN, ("encoder",) for DeepLabV3Plus).
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import numpy as np

_BN_LEAF = {
    "weight": "scale",
    "bias": "bias",
    "running_mean": "mean",
    "running_var": "var",
}


def _map_key(key: str) -> list[str] | None:
    parts = key.split(".")
    if parts[0] == "conv1" and parts[-1] == "weight":
        return ["stem_conv", "kernel"]
    if parts[0] == "bn1" and parts[-1] in _BN_LEAF:
        return ["FrozenBatchNorm_0", _BN_LEAF[parts[-1]]]
    m = re.fullmatch(r"layer(\d)", parts[0])
    if not m:
        return None
    block = f"stage{int(m.group(1)) + 1}_block{parts[1]}"
    sub = parts[2]
    leaf = parts[-1]
    cm = re.fullmatch(r"conv(\d)", sub)
    bm = re.fullmatch(r"bn(\d)", sub)
    if cm and leaf == "weight":
        return [block, f"Conv_{int(cm.group(1)) - 1}", "kernel"]
    if bm and leaf in _BN_LEAF:
        return [block, f"FrozenBatchNorm_{int(bm.group(1)) - 1}", _BN_LEAF[leaf]]
    if sub == "downsample":
        if parts[3] == "0" and leaf == "weight":
            return [block, "proj", "kernel"]
        if parts[3] == "1" and leaf in _BN_LEAF:
            return [block, "FrozenBatchNorm_3", _BN_LEAF[leaf]]
    return None


def convert_resnet_state_dict(
    state_dict: dict, params_like, prefix: tuple = ()
) -> dict:
    """Convert into a full params tree matching `params_like`; entries under
    `prefix` come from the checkpoint, everything else is copied from
    `params_like` (heads stay randomly initialized)."""
    flat_like = {
        tuple(str(k.key) for k in kp): v
        for kp, v in jax.tree_util.tree_flatten_with_path(params_like)[0]
    }

    converted = {}
    for key, w in state_dict.items():
        mapped = _map_key(key)
        if mapped is None:
            continue
        w = np.asarray(w)
        if mapped[-1] == "kernel":
            w = np.transpose(w, (2, 3, 1, 0))  # OIHW → HWIO
        full = ("params", *prefix, *mapped)
        if full not in flat_like:
            raise ValueError(f"{key} → {full}: no such param in target tree")
        if tuple(w.shape) != tuple(flat_like[full].shape):
            raise ValueError(
                f"{key}: shape {w.shape} != {flat_like[full].shape}"
            )
        converted[full] = jnp.asarray(w)

    backbone_keys = [
        p for p in flat_like if p[: 1 + len(prefix)] == ("params", *prefix)
    ]
    missing = [p for p in backbone_keys if p not in converted]
    if missing:
        raise ValueError(
            f"checkpoint missing {len(missing)} backbone params, "
            f"e.g. {missing[:5]}"
        )

    tree: dict = {}
    for path, v in flat_like.items():
        v = converted.get(path, v)
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree
