"""Round-trip tests for the TF-checkpoint converters.

No real TF checkpoints exist in this environment (zero egress; the reference
mount is empty), so the mapping tables are validated structurally: each test
builds a synthetic TF-style variable dict by INVERTING the converter's name
mapping over the real flax parameter tree, runs the converter, and asserts
numerical identity. This pins (a) every name in the table resolves to a real
parameter, (b) shapes/transforms are mutually consistent, and (c) coverage
is total (the converters' `require=` makes missing params a loud failure).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from premvos_tpu.config import ProposalConfig, RefineConfig, ReIDConfig
from premvos_tpu.io_compat.convert_tf import (
    convert_tf_dict,
    fc_nchw_to_nhwc,
    fc_nhwc_to_nchw,
    resnet_rules,
)
from premvos_tpu.io_compat.convert_tf_maskrcnn import convert_tf_maskrcnn
from premvos_tpu.io_compat.convert_tf_refine import convert_tf_refine
from premvos_tpu.io_compat.convert_tf_reid import convert_tf_reid

_BN_INV = {"scale": "gamma", "bias": "beta", "mean": "mean/EMA", "var": "variance/EMA"}


def _flat(params):
    return {
        tuple(str(k.key) for k in kp): np.asarray(v)
        for kp, v in jax.tree_util.tree_flatten_with_path(params)[0]
    }


def _tf_resnet_name(path):
    """Inverse of convert_tf.resnet_rules for one flax path (under the
    backbone prefix, prefix already stripped)."""
    if path == ("stem_conv", "kernel"):
        return "conv0/W"
    if path[0] == "FrozenBatchNorm_0" and len(path) == 2:
        return f"conv0/bn/{_BN_INV[path[1]]}"
    m = re.fullmatch(r"stage(\d)_block(\d+)", path[0])
    assert m, path
    g, b = int(m.group(1)) - 2, m.group(2)
    mod, leaf = path[1], path[2]
    if mod == "proj":
        return f"group{g}/block{b}/convshortcut/W"
    if mod == "FrozenBatchNorm_3":
        return f"group{g}/block{b}/convshortcut/bn/{_BN_INV[leaf]}"
    if mod.startswith("Conv_"):
        return f"group{g}/block{b}/conv{int(mod[5:]) + 1}/W"
    if mod.startswith("FrozenBatchNorm_"):
        return f"group{g}/block{b}/conv{int(mod[16:]) + 1}/bn/{_BN_INV[leaf]}"
    raise AssertionError(path)


def _rand_like(rng, arr):
    return rng.standard_normal(arr.shape).astype(np.float32)


@pytest.fixture(scope="module")
def frng():
    return np.random.default_rng(7)


def test_fc_row_reorder_roundtrip(frng):
    w = frng.standard_normal((7 * 7 * 32, 16)).astype(np.float32)
    np.testing.assert_array_equal(
        fc_nchw_to_nhwc(fc_nhwc_to_nchw(w, 7, 32), 7, 32), w
    )


def test_convert_tf_maskrcnn_roundtrip(frng):
    from premvos_tpu.models.anchors import pyramid_anchors
    from premvos_tpu.models.maskrcnn import MaskRCNN

    cfg = ProposalConfig(
        backbone_depth=26, fpn_channels=32, rpn_pre_nms_topk=32,
        rpn_post_nms_topk=8, detections_per_frame=4,
    )
    model = MaskRCNN(cfg=cfg)
    anchors = {
        k: jnp.asarray(v)
        for k, v in pyramid_anchors(
            64, 64, cfg.anchor_scales, cfg.anchor_ratios
        ).items()
    }
    # Only leaf shapes/dtypes matter to the converter — eval_shape skips the
    # init compile (was ~35 s of the fast suite); zeros materialize the tree
    # for transforms that read array values.
    params = jax.tree.map(
        lambda s: np.zeros(s.shape, s.dtype),
        jax.eval_shape(
            model.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
            anchors,
        ),
    )
    flat = _flat(params)

    tf_vars = {"global_step": np.zeros(()), "learning_rate": np.ones(())}
    expect = {}
    for path, arr in flat.items():
        assert path[0] == "params"
        p = path[1:]
        w = _rand_like(frng, arr)
        expect[path] = w
        if p[0] == "backbone":
            tf_vars[_tf_resnet_name(p[1:])] = w
        elif p[0] == "fpn":
            kind = "lateral_1x1_c" if p[1].startswith("lat") else "posthoc_3x3_p"
            lvl = p[1][-1]
            leaf = "W" if p[2] == "kernel" else "b"
            tf_vars[f"fpn_{kind}{lvl}/{leaf}"] = w
        elif p[0] == "rpn":
            sub = {"Conv_0": "conv0", "Conv_1": "class", "Conv_2": "box"}[p[1]]
            tf_vars[f"rpn/{sub}/{'W' if p[2] == 'kernel' else 'b'}"] = w
        elif p[0] == "box_head":
            sub = {"Dense_0": "fc6", "Dense_1": "fc7", "Dense_2": "class", "Dense_3": "box"}[p[1]]
            if sub == "fc6" and p[2] == "kernel":
                w = fc_nhwc_to_nchw(w, cfg.roi_align_size, cfg.fpn_channels)
            tf_vars[f"fastrcnn/{sub}/{'W' if p[2] == 'kernel' else 'b'}"] = w
        elif p[0] == "mask_head":
            sub = {"conv0": "fcn0", "conv1": "fcn1", "conv2": "fcn2",
                   "conv3": "fcn3", "deconv": "deconv", "logits": "conv"}[p[1]]
            if sub == "deconv" and p[2] == "kernel":
                w = np.transpose(w, (0, 1, 3, 2))  # flax → TF deconv layout
            tf_vars[f"maskrcnn/{sub}/{'W' if p[2] == 'kernel' else 'b'}"] = w
        else:
            raise AssertionError(p)

    out = convert_tf_maskrcnn(
        tf_vars, params, roi_align_size=cfg.roi_align_size,
        fpn_channels=cfg.fpn_channels,
    )
    got = _flat(out)
    assert got.keys() == flat.keys()
    for path in flat:
        np.testing.assert_array_equal(got[path], expect[path], err_msg=str(path))


def test_convert_tf_refine_roundtrip(frng):
    from premvos_tpu.models.deeplab import DeepLabV3Plus

    model = DeepLabV3Plus(cfg=RefineConfig(crop_size=33, backbone_depth=26))
    # shapes only — see the maskrcnn roundtrip note
    params = jax.tree.map(
        lambda s: np.zeros(s.shape, s.dtype),
        jax.eval_shape(
            model.init, jax.random.PRNGKey(0), jnp.zeros((1, 33, 33, 4))
        ),
    )
    flat = _flat(params)

    tf_vars = {"global_step": np.zeros(())}
    expect = {}
    dec_bn = {"FrozenBatchNorm_0": "low_bn", "FrozenBatchNorm_1": "dec_bn0",
              "FrozenBatchNorm_2": "dec_bn1"}
    for path, arr in flat.items():
        p = path[1:]
        w = _rand_like(frng, arr)
        expect[path] = w
        if p[0] == "encoder":
            tf_vars["resnet/" + _tf_resnet_name(p[1:])] = w
        elif p[0] == "aspp":
            if p[1].startswith("Conv_"):
                tf_vars[f"aspp/conv{p[1][5:]}/W"] = w
            else:
                tf_vars[f"aspp/bn{p[1][16:]}/{_BN_INV[p[2]]}"] = w
        elif p[0] in dec_bn:
            tf_vars[f"{dec_bn[p[0]]}/{_BN_INV[p[1]]}"] = w
        elif p[0] == "low_proj":
            tf_vars["low_proj/W"] = w
        elif p[0] == "dec0":
            tf_vars["decoder/conv0/W"] = w
        elif p[0] == "dec1":
            tf_vars["decoder/conv1/W"] = w
        elif p[0] == "cls":
            tf_vars[f"cls/{'W' if p[1] == 'kernel' else 'b'}"] = w
        else:
            raise AssertionError(p)

    got = _flat(convert_tf_refine(tf_vars, params))
    for path in flat:
        np.testing.assert_array_equal(got[path], expect[path], err_msg=str(path))


def test_convert_tf_reid_roundtrip(frng):
    from premvos_tpu.models.reid import ReIDNet

    model = ReIDNet(cfg=ReIDConfig(backbone_depth=26, embedding_dim=8, crop_size=32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    flat = _flat(params)

    tf_vars = {"Adam/beta1_power": np.zeros(())}
    expect = {}
    for path, arr in flat.items():
        p = path[1:]
        w = _rand_like(frng, arr)
        expect[path] = w
        if p[0] == "backbone":
            tf_vars["resnet/" + _tf_resnet_name(p[1:])] = w
        elif p[0] in ("fc1", "emb"):
            tf_vars[f"{p[0]}/{'W' if p[1] == 'kernel' else 'b'}"] = w
        else:
            raise AssertionError(p)

    got = _flat(convert_tf_reid(tf_vars, params))
    for path in flat:
        np.testing.assert_array_equal(got[path], expect[path], err_msg=str(path))


def test_convert_shape_mismatch_fails(frng):
    from premvos_tpu.models.reid import ReIDNet

    model = ReIDNet(cfg=ReIDConfig(backbone_depth=26, embedding_dim=8, crop_size=32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    with pytest.raises(ValueError, match="shape"):
        convert_tf_dict(
            {"fc1/W": np.zeros((3, 3), np.float32)},
            lambda n: (("fc1", "kernel"), "none") if n == "fc1/W" else None,
            params,
        )


def test_convert_missing_required_fails(frng):
    from premvos_tpu.models.reid import ReIDNet

    model = ReIDNet(cfg=ReIDConfig(backbone_depth=26, embedding_dim=8, crop_size=32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    with pytest.raises(ValueError, match="missing"):
        convert_tf_reid({"fc1/W": np.zeros((2048, 1024), np.float32)}, params)


def test_unmapped_params_fall_back_to_like(frng):
    """Heads not covered by the checkpoint keep their params_like values."""
    from premvos_tpu.models.reid import ReIDNet

    model = ReIDNet(cfg=ReIDConfig(backbone_depth=26, embedding_dim=8, crop_size=32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    flat = _flat(params)
    tf_vars = {
        "resnet/" + _tf_resnet_name(p[2:]): _rand_like(frng, a)
        for p, a in flat.items()
        if p[1] == "backbone"
    }
    out = convert_tf_dict(
        tf_vars, resnet_rules(("backbone",), "resnet"), params,
        require=(("backbone",),),
    )
    got = _flat(out)
    for path, arr in flat.items():
        if path[1] != "backbone":
            np.testing.assert_array_equal(got[path], arr)
