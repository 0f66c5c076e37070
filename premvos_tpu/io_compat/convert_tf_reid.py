"""TF ReID-net checkpoint → premvos_tpu ReIDNet params.

The reference's triplet-ReID net shares the OnAVOS-family TF framework with
the refinement net (`ReID_net/` expected path — unverified, mount empty):
ResNet backbone + a bottleneck FC + the embedding FC (Hermans et al.
"In Defense of the Triplet Loss" architecture). Assumed naming (documented
schema, adjustable table):

  backbone   conv0, group{g}/block{b}/… under prefix "resnet"
  head       fc1/{W,b}  (bottleneck, 1024-d)
             emb/{W,b}  (final embedding, ~128-d)
"""

from __future__ import annotations

from premvos_tpu.io_compat.convert_tf import (
    chain,
    convert_tf_dict,
    resnet_rules,
    table_rule,
)


def convert_tf_reid(tf_vars: dict, params_like) -> dict:
    """Convert a TF ReID checkpoint dict into ReIDNet params."""
    rule = chain(
        resnet_rules(flax_prefix=("backbone",), tf_prefix="resnet"),
        table_rule(
            {
                "fc1/W": ("fc1", "kernel"),
                "fc1/b": ("fc1", "bias"),
                "emb/W": ("emb", "kernel"),
                "emb/b": ("emb", "bias"),
            }
        ),
    )
    return convert_tf_dict(
        tf_vars,
        rule,
        params_like,
        require=(("backbone",), ("fc1",), ("emb",)),
    )
