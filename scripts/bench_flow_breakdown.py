"""Split the flow-stage hotspot: FlowNet2 net vs mask-warp gathers.

The stage budget shows flow+warp ≈ 70 ms/frame of a ~110 ms/frame e2e.
This times each piece with upload-fenced, slope-based methodology:
  * FlowNet2 full stack / FlowNetC alone (448×832),
  * the flow→480×864 upsample,
  * warp_masks exact vs warp_stride 2/4 ([8, 480, 864] masks),
  * one in-net-scale resample2d (448×832×3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/premvos_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def timed_med(fn, make_args, runs=7):
    args0 = make_args(0)
    jax.block_until_ready(args0)
    out = fn(*args0)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    ts = []
    for s in range(1, 1 + runs):
        a = make_args(s)
        jax.block_until_ready(a)
        t0 = time.perf_counter()
        out = fn(*a)
        _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def marginal(fn, mk, b1, b2):
    t1 = timed_med(fn, lambda s: mk(s, b1))
    t2 = timed_med(fn, lambda s: mk(s, b2))
    return (t2 - t1) / (b2 - b1), t1, t2


def emit(name, m, t1, b1, t2, b2):
    print(json.dumps({
        "metric": name, "marginal_ms": round(m * 1000, 2),
        "batch_times_ms": {str(b1): round(t1 * 1e3, 1), str(b2): round(t2 * 1e3, 1)},
    }), flush=True)


def main():
    from premvos_tpu.config import FlowConfig
    from premvos_tpu.models.flownet import FlowNet2
    from premvos_tpu.ops.resample2d import resample2d
    from premvos_tpu.stages.flow import warp_masks, warp_masks_coarse

    fh, fw = 448, 832
    h, w = 480, 864
    k = 8

    def fresh(seed, shape, dtype=jnp.float32):
        return jnp.asarray(np.random.default_rng(seed).standard_normal(shape), dtype)

    for variant in ("flownet2", "flownetc"):
        net = FlowNet2(variant=variant, max_displacement=20, corr_stride=2)
        params = jax.jit(net.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, fh, fw, 3)), jnp.zeros((1, fh, fw, 3))
        )
        f = jax.jit(lambda pr, a, b, net=net: net.apply(pr, a, b))
        m, t1, t2 = marginal(
            f, lambda s, b: (params, fresh(s, (b, fh, fw, 3)), fresh(s + 9, (b, fh, fw, 3))),
            2, 6,
        )
        emit(f"{variant}_448x832", m, t1, 2, t2, 6)

    up = jax.jit(lambda fl: jax.image.resize(fl, (fl.shape[0], h, w, 2), "bilinear"))
    m, t1, t2 = marginal(up, lambda s, b: (fresh(s, (b, fh // 4, fw // 4, 2)),), 2, 6)
    emit("flow_upsample_to_480x864", m, t1, 2, t2, 6)

    for stride in (1, 2, 4):
        wfn = jax.jit(
            lambda ms, fl, st=stride: jax.vmap(
                lambda m1, f1: warp_masks_coarse(m1, f1, st), in_axes=(None, 0)
            )(ms, fl)
        )
        m, t1, t2 = marginal(
            wfn,
            lambda s, b: (fresh(s, (k, h, w)), 5.0 * fresh(s + 7, (b, h, w, 2))),
            2, 6,
        )
        emit(f"warp_masks_8x480x864_stride{stride}", m, t1, 2, t2, 6)

    r1 = jax.jit(lambda im, fl: jax.vmap(resample2d)(im, fl))
    m, t1, t2 = marginal(
        r1,
        lambda s, b: (fresh(s, (b, fh, fw, 3)), 5.0 * fresh(s + 3, (b, fh, fw, 2))),
        2, 6,
    )
    emit("resample2d_448x832x3", m, t1, 2, t2, 6)

    # Block-sliced residual-window warp (the production TPU path; smooth
    # flows so the residual window is exercised, not just the fallback).
    from premvos_tpu.ops.resample2d import resample2d_block

    def smoothflow(seed, b, hh, ww, amp=15.0):
        r = np.random.default_rng(seed)
        co = r.uniform(-amp, amp, (b, 4, 6, 2)).astype(np.float32)
        return jax.image.resize(jnp.asarray(co), (b, hh, ww, 2), "bilinear")

    rb = jax.jit(lambda im, fl: resample2d_block(im, fl))
    m, t1, t2 = marginal(
        rb, lambda s, b: (fresh(s, (b, fh, fw, 3)), smoothflow(s + 3, b, fh, fw)),
        2, 6,
    )
    emit("resample2d_block_448x832x3", m, t1, 2, t2, 6)

    # exact packed-mask warp (warp_masks impl='block'): [8, 480, 864]
    from premvos_tpu.stages.flow import warp_masks

    wb = jax.jit(
        lambda ms, fl: jax.vmap(
            lambda f1: warp_masks(ms, f1, impl="block"), in_axes=0
        )(fl)
    )
    m, t1, t2 = marginal(
        wb, lambda s, b: (fresh(s, (k, h, w)), smoothflow(s + 7, b, h, w)),
        2, 6,
    )
    emit("warp_masks8_block_480x864", m, t1, 2, t2, 6)


if __name__ == "__main__":
    main()
