"""Generic TF-checkpoint-dict → flax params conversion engine.

The reference distributes TF `Saver` checkpoints for three of its four nets
(SURVEY.md C17/C19: the Mask R-CNN stage, `refinement_net/`, `ReID_net/` —
expected paths, unverified: the reference mount has been empty every round).
This module is the shared machinery; the per-net variable-name mapping
tables live in `convert_tf_maskrcnn.py`, `convert_tf_refine.py`,
`convert_tf_reid.py`.

A "TF checkpoint dict" here is `{variable_name: np.ndarray}` — what
`tf.train.load_checkpoint` + `get_variable_to_shape_map` yields, or any
npz/pickle re-export of one. TF tensor layouts:
  * conv kernels are already HWIO (matches flax) — no transpose,
  * dense kernels are [in, out] (matches flax) — no transpose,
  * conv-transpose kernels are [H, W, out, in] → flax wants [H, W, in, out],
  * fully-connected layers that follow a spatial flatten may use NCHW
    flatten order (tensorpack does) → reorder rows with `fc_nchw_to_nhwc`.

Because no real checkpoints exist in this environment (zero egress), the
name tables are validated structurally: round-trip unit tests synthesize a
TF-style dict via each table's inverse and assert numerical identity
(tests/test_convert_tf.py). When real checkpoints appear, only the tables
should need touching — the engine is name-agnostic.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

# A rule maps a TF variable name to (flax_path, transform) or None.
Rule = Callable[[str], "tuple[tuple[str, ...], str] | None"]

_TRANSFORMS = {
    "none": lambda w: w,
    # TF conv2d_transpose kernel [H, W, out, in] → flax ConvTranspose
    # [H, W, in, out].
    "deconv": lambda w: np.transpose(w, (0, 1, 3, 2)),
}


def fc_nchw_to_nhwc(w: np.ndarray, size: int, channels: int) -> np.ndarray:
    """Reorder a dense kernel's input rows from an NCHW spatial flatten
    (c·size² + y·size + x — tensorpack's fc6 layout) to our NHWC flatten
    (y·size·C + x·C + c)."""
    assert w.shape[0] == size * size * channels, (w.shape, size, channels)
    w = w.reshape(channels, size, size, -1)  # rows as [C, H, W]
    w = np.transpose(w, (1, 2, 0, 3))  # → [H, W, C]
    return w.reshape(size * size * channels, -1)


def fc_nhwc_to_nchw(w: np.ndarray, size: int, channels: int) -> np.ndarray:
    """Inverse of `fc_nchw_to_nhwc` (used by the round-trip tests)."""
    w = w.reshape(size, size, channels, -1)
    w = np.transpose(w, (2, 0, 1, 3))
    return w.reshape(size * size * channels, -1)


def resnet_rules(
    flax_prefix: tuple = ("backbone",), tf_prefix: str = ""
) -> Rule:
    """Tensorpack-style ResNet naming → our ResNet backbone.

      conv0/W                          → stem_conv/kernel
      conv0/bn/{gamma,beta,EMAs}       → FrozenBatchNorm_0/…
      group{g}/block{b}/conv{n}/W      → stage{g+2}_block{b}/Conv_{n−1}/kernel
      group{g}/block{b}/conv{n}/bn/…   → stage{g+2}_block{b}/FrozenBatchNorm_{n−1}/…
      group{g}/block{b}/convshortcut/W → stage{g+2}_block{b}/proj/kernel
      group{g}/block{b}/convshortcut/bn/… → …/FrozenBatchNorm_3/…

    (Expected reference graph names — `MaskRCNN/basemodel.py`, unverified.)
    """
    import re

    bn_leaf = {
        "gamma": "scale",
        "beta": "bias",
        "mean/EMA": "mean",
        "variance/EMA": "var",
    }

    def rule(name: str):
        if tf_prefix:
            if not name.startswith(tf_prefix + "/"):
                return None
            name = name[len(tf_prefix) + 1 :]
        if name == "conv0/W":
            return (*flax_prefix, "stem_conv", "kernel"), "none"
        m = re.fullmatch(r"conv0/bn/(.+)", name)
        if m and m.group(1) in bn_leaf:
            return (*flax_prefix, "FrozenBatchNorm_0", bn_leaf[m.group(1)]), "none"
        m = re.fullmatch(r"group(\d)/block(\d+)/(conv\d|convshortcut)(/bn)?/(.+)", name)
        if not m:
            return None
        g, b, conv, is_bn, leaf = m.groups()
        block = f"stage{int(g) + 2}_block{b}"
        if conv == "convshortcut":
            mod = "proj" if not is_bn else "FrozenBatchNorm_3"
        else:
            i = int(conv[4:]) - 1
            mod = f"Conv_{i}" if not is_bn else f"FrozenBatchNorm_{i}"
        if is_bn:
            if leaf not in bn_leaf:
                return None
            return (*flax_prefix, block, mod, bn_leaf[leaf]), "none"
        if leaf == "W":
            return (*flax_prefix, block, mod, "kernel"), "none"
        return None

    return rule


def chain(*rules: Rule) -> Rule:
    def rule(name: str):
        for r in rules:
            out = r(name)
            if out is not None:
                return out
        return None

    return rule


def table_rule(table: dict) -> Rule:
    """Exact-name table: {tf_name: (flax_path, transform)} or
    {tf_name: flax_path} (transform defaults to 'none')."""

    def rule(name: str):
        v = table.get(name)
        if v is None:
            return None
        # (path, transform) is distinguished STRUCTURALLY: its first element
        # is itself a tuple (the flax path). A bare length-2 flax path like
        # ("module", "kernel") has a str first element, so a leaf that
        # happens to be named like a transform can never be misparsed.
        if (
            isinstance(v, tuple)
            and len(v) == 2
            and isinstance(v[0], tuple)
            and isinstance(v[1], str)
        ):
            return v
        return v, "none"

    return rule


def convert_tf_dict(
    tf_vars: dict,
    rule: Rule,
    params_like,
    require: tuple = (),
    extra_transforms: dict | None = None,
) -> dict:
    """Map a TF checkpoint dict into a params tree shaped like `params_like`.

    Variables the rule doesn't recognize are skipped (TF ckpts carry
    optimizer slots, global_step, etc.). Mapped variables are shape-checked.
    Every target parameter under a prefix listed in `require` must be
    provided by the checkpoint, or conversion fails loudly — everything else
    falls back to `params_like` (e.g. heads left at random init).
    """
    transforms = dict(_TRANSFORMS)
    if extra_transforms:
        transforms.update(extra_transforms)

    flat_like = {
        tuple(str(k.key) for k in kp): v
        for kp, v in jax.tree_util.tree_flatten_with_path(params_like)[0]
    }

    converted = {}
    for name, w in tf_vars.items():
        mapped = rule(name)
        if mapped is None:
            continue
        path, transform = mapped
        if callable(transform):
            w = np.asarray(transform(np.asarray(w)))
        else:
            w = np.asarray(transforms[transform](np.asarray(w)))
        full = ("params", *path)
        if full not in flat_like:
            raise ValueError(f"{name} → {full}: no such param in target tree")
        if tuple(w.shape) != tuple(flat_like[full].shape):
            raise ValueError(
                f"{name} → {full}: shape {w.shape} != {flat_like[full].shape}"
            )
        converted[full] = jnp.asarray(w)

    for prefix in require:
        prefix = ("params", *prefix)
        wanted = [p for p in flat_like if p[: len(prefix)] == prefix]
        missing = [p for p in wanted if p not in converted]
        if missing:
            raise ValueError(
                f"checkpoint missing {len(missing)} params under "
                f"{'/'.join(prefix)}, e.g. {missing[:5]}"
            )

    tree: dict = {}
    for path, v in flat_like.items():
        v = converted.get(path, v)
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def load_tf_checkpoint_vars(path: str) -> dict:
    """Read `{name: array}` from a TF checkpoint re-export.

    Zero-egress build: TensorFlow itself is not installed here, so this
    reads the portable re-exports we can produce elsewhere — `.npz`
    (np.savez of name→array) or a pickled dict. If TF is present, reads
    native checkpoints too.
    """
    import os
    import pickle

    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    if path.endswith((".pkl", ".pickle")):
        with open(path, "rb") as f:
            return pickle.load(f)
    try:  # native TF checkpoint, only if TF is importable
        import tensorflow as tf  # type: ignore

        reader = tf.train.load_checkpoint(path)
        return {
            name: reader.get_tensor(name)
            for name in reader.get_variable_to_shape_map()
        }
    except ImportError as e:
        raise ValueError(
            f"{path}: not an .npz/.pkl re-export and TensorFlow is not "
            "installed to read native checkpoints"
        ) from e
