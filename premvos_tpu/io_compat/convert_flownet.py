"""flownet2-pytorch checkpoint → premvos_tpu FlowNet2 params converter.

The reference distributes FlowNet2 weights as PyTorch checkpoints (README
Drive links; SURVEY.md C19). This environment has no network, so no real
checkpoint ships here — this converter exists so a user with the official
`FlowNet2_checkpoint.pth.tar` can load it:

    import torch
    sd = torch.load(path, map_location="cpu")["state_dict"]
    params = convert_flownet2_state_dict(sd, params_like=init_params)

Layout mapping (torch module → flax path):
    flownetc.conv1.0.*           → flownetc/encoder/conv1/Conv_0
    flownetc.conv_redir.0.*      → flownetc/conv_redir/Conv_0
    flownetc.conv3_1.0.*         → flownetc/conv3_1/Conv_0
    flownetc.deconv5.0.*         → flownetc/decoder/deconv5/ConvTranspose_0
    flownetc.predict_flow6.*     → flownetc/decoder/predict_flow6/Conv_0
    flownetc.upsampled_flow6_to_5.* → …/decoder/upsampled_flow6_to_5/ConvTranspose_0
    (same per flownets_1 / flownets_2 / flownetsd / flownetfusion)

Tensor layout: torch Conv2d OIHW → flax HWIO; torch ConvTranspose2d
(I, O, kh, kw) → flax (kh, kw, I, O) with a spatial flip (torch's transposed
conv is the true convolution / gradient-of-conv; flax's ConvTranspose
cross-correlates). Both conversions are numerically validated against torch
in tests/test_convert_flownet.py.
"""

from __future__ import annotations

import re

import jax
import numpy as np

_ENCODER_CONVS = {"conv1", "conv2", "conv3"}  # FlowNetC shared tower


def conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv2d weight OIHW → flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def convtranspose_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight (I, O, kh, kw) → flax (kh, kw, I, O),
    spatially flipped (conv vs cross-correlation)."""
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()


def _torch_key_to_path(key: str) -> tuple[list[str], bool] | None:
    """Map a flownet2-pytorch state-dict key to (flax path, is_transpose).

    Returns None for keys we don't consume (e.g. batchnorm of bn variants).
    """
    parts = key.split(".")
    if parts[-1] not in ("weight", "bias"):
        return None
    leaf = "kernel" if parts[-1] == "weight" else "bias"
    net, rest = parts[0], parts[1:-1]
    if not rest:
        return None
    layer = rest[0]

    decoder_deconv = re.fullmatch(r"deconv\d", layer)
    decoder_upflow = re.fullmatch(r"upsampled_flow\d_to_\d", layer)
    decoder_predict = re.fullmatch(r"predict_flow\d", layer)

    if decoder_upflow:
        return [net, "decoder", layer, "ConvTranspose_0", leaf], True
    if decoder_deconv:
        return [net, "decoder", layer, "ConvTranspose_0", leaf], True
    if decoder_predict:
        return [net, "decoder", layer, "Conv_0", leaf], False
    # Encoder / plain convs (possibly wrapped in Sequential: "conv1.0").
    if net == "flownetc" and layer in _ENCODER_CONVS:
        return [net, "encoder", layer, "Conv_0", leaf], False
    if re.fullmatch(r"(conv\w*|conv_redir|inter_conv\d)", layer):
        return [net, layer, "Conv_0", leaf], False
    return None


def convert_flownet2_state_dict(state_dict: dict, params_like) -> dict:
    """Convert a flownet2-pytorch state dict into a params pytree matching
    `params_like` (from FlowNet2.init). Raises on shape mismatches; keys in
    the checkpoint with no counterpart (or vice versa) are reported."""
    flat_like = dict(
        jax.tree_util.tree_flatten_with_path(params_like)[0]
        and {
            tuple(str(k.key) for k in kp): v
            for kp, v in jax.tree_util.tree_flatten_with_path(params_like)[0]
        }
    )

    out = {}
    unused = []
    for key, w in state_dict.items():
        mapped = _torch_key_to_path(key)
        if mapped is None:
            unused.append(key)
            continue
        path, is_t = mapped
        w = np.asarray(w)
        if path[-1] == "kernel":
            w = convtranspose_kernel(w) if is_t else conv_kernel(w)
        full = ("params", *path)
        if full not in flat_like:
            unused.append(key)
            continue
        want = flat_like[full].shape
        if tuple(w.shape) != tuple(want):
            raise ValueError(f"{key}: shape {w.shape} != expected {want}")
        out[full] = w

    missing = [p for p in flat_like if p not in out]
    if missing:
        raise ValueError(
            f"checkpoint missing {len(missing)} params, e.g. {missing[:5]}"
        )

    # Rebuild the nested tree.
    tree: dict = {}
    for path, w in out.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = jax.numpy.asarray(w)
    return tree, unused
