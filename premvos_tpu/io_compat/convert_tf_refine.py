"""TF refinement-net checkpoint → premvos_tpu DeepLabV3Plus params.

The reference's refinement net lives in the OnAVOS-family TF framework
(`refinement_net/network/` expected path — unverified, mount empty): a
DeepLabv3+ with a ResNet encoder, trained/saved via TF `Saver`. Assumed
graph naming (documented schema; adjust the table when a real checkpoint
appears — the engine is name-agnostic):

  encoder      conv0, group{g}/block{b}/… under prefix "resnet" (tensorpack
               style, shared with the Mask R-CNN backbone converter)
  ASPP         aspp/conv{0-5}/W, aspp/bn{0-5}/{gamma,beta,EMAs}
               (0: 1×1, 1-3: dilated 3×3 @ 6/12/18, 4: image pooling 1×1,
                5: projection after concat)
  decoder      low_proj/W + low_bn/…, decoder/conv0/W + dec_bn0/…,
               decoder/conv1/W + dec_bn1/…, cls/{W,b}

Our tree (models/deeplab.py): the three top-level FrozenBatchNorm_{0,1,2}
are the low-level-projection norm and the two decoder-conv norms, in that
order.
"""

from __future__ import annotations

import re

from premvos_tpu.io_compat.convert_tf import (
    chain,
    convert_tf_dict,
    resnet_rules,
    table_rule,
)

_BN_LEAF = {
    "gamma": "scale",
    "beta": "bias",
    "mean/EMA": "mean",
    "variance/EMA": "var",
}


def _decoder_rules():
    def rule(name: str):
        m = re.fullmatch(r"aspp/conv([0-5])/W", name)
        if m:
            return ("aspp", f"Conv_{m.group(1)}", "kernel"), "none"
        m = re.fullmatch(r"aspp/bn([0-5])/(.+)", name)
        if m and m.group(2) in _BN_LEAF:
            return (
                ("aspp", f"FrozenBatchNorm_{m.group(1)}", _BN_LEAF[m.group(2)]),
                "none",
            )
        m = re.fullmatch(r"(low_bn|dec_bn0|dec_bn1)/(.+)", name)
        if m and m.group(2) in _BN_LEAF:
            idx = {"low_bn": 0, "dec_bn0": 1, "dec_bn1": 2}[m.group(1)]
            return (f"FrozenBatchNorm_{idx}", _BN_LEAF[m.group(2)]), "none"
        return None

    return rule


def convert_tf_refine(tf_vars: dict, params_like) -> dict:
    """Convert a TF refinement-net checkpoint dict into DeepLabV3Plus params."""
    rule = chain(
        resnet_rules(flax_prefix=("encoder",), tf_prefix="resnet"),
        _decoder_rules(),
        table_rule(
            {
                "low_proj/W": ("low_proj", "kernel"),
                "decoder/conv0/W": ("dec0", "kernel"),
                "decoder/conv1/W": ("dec1", "kernel"),
                "cls/W": ("cls", "kernel"),
                "cls/b": ("cls", "bias"),
            }
        ),
    )
    return convert_tf_dict(
        tf_vars,
        rule,
        params_like,
        require=(("encoder",), ("aspp",), ("cls",)),
    )
