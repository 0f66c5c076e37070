"""Compare resample2d formulations on TPU: the warp gather is ~56 ms of the
~110 ms/frame pipeline (4 warps × 13.9 ms inside FlowNet2).

Variants:
  v4gather — current: 4 advanced-index gathers (f00/f01/f10/f11)
  vpatch   — ONE lax.gather of 2×2×C patches (amortizes per-element gather
             overhead 4×), base clamped to size-2 with frac recomputed
  vflat    — 4 takes on a flattened [H·W, C] operand (1-D index arithmetic)
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/premvos_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from premvos_tpu.ops.resample2d import resample2d


def resample2d_patch(src, flow):
    h, w, c = src.shape
    yy = jnp.arange(h, dtype=flow.dtype)[:, None]
    xx = jnp.arange(w, dtype=flow.dtype)[None, :]
    sx = jnp.clip(xx + flow[..., 0], 0.0, w - 1.0)
    sy = jnp.clip(yy + flow[..., 1], 0.0, h - 1.0)
    y0 = jnp.minimum(jnp.floor(sy), h - 2).astype(jnp.int32)
    x0 = jnp.minimum(jnp.floor(sx), w - 2).astype(jnp.int32)
    wy = (sy - y0)[..., None]
    wx = (sx - x0)[..., None]

    starts = jnp.stack([y0, x0], axis=-1).reshape(h * w, 2)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )
    patches = jax.lax.gather(
        src, starts, dnums, slice_sizes=(2, 2, c),
        mode=jax.lax.GatherScatterMode.CLIP,
    ).reshape(h, w, 2, 2, c)
    top = patches[:, :, 0, 0] * (1 - wx) + patches[:, :, 0, 1] * wx
    bot = patches[:, :, 1, 0] * (1 - wx) + patches[:, :, 1, 1] * wx
    return top * (1 - wy) + bot * wy


def resample2d_flat(src, flow):
    h, w, c = src.shape
    yy = jnp.arange(h, dtype=flow.dtype)[:, None]
    xx = jnp.arange(w, dtype=flow.dtype)[None, :]
    sx = jnp.clip(xx + flow[..., 0], 0.0, w - 1.0)
    sy = jnp.clip(yy + flow[..., 1], 0.0, h - 1.0)
    y0 = jnp.floor(sy).astype(jnp.int32)
    x0 = jnp.floor(sx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (sy - y0)[..., None]
    wx = (sx - x0)[..., None]
    f = src.reshape(h * w, c)
    f00 = jnp.take(f, y0 * w + x0, axis=0)
    f01 = jnp.take(f, y0 * w + x1, axis=0)
    f10 = jnp.take(f, y1 * w + x0, axis=0)
    f11 = jnp.take(f, y1 * w + x1, axis=0)
    top = f00 * (1 - wx) + f01 * wx
    bot = f10 * (1 - wx) + f11 * wx
    return top * (1 - wy) + bot * wy


def timed_med(fn, mk, runs=7):
    a = mk(0)
    jax.block_until_ready(a)
    out = fn(*a)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    ts = []
    for s in range(1, 1 + runs):
        a = mk(s)
        jax.block_until_ready(a)
        t0 = time.perf_counter()
        out = fn(*a)
        _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    from premvos_tpu.ops.resample2d import resample2d as resample2d_prod
    from premvos_tpu.ops.resample2d import resample2d_reference

    h, w, c = 448, 832, 3

    def fresh(seed, shape, dtype=jnp.float32):
        return jnp.asarray(np.random.default_rng(seed).standard_normal(shape), dtype)

    # correctness vs the four-corner oracle
    src = fresh(0, (h, w, c))
    flow = 15.0 * fresh(1, (h, w, 2))
    want = np.asarray(resample2d_reference(src, flow))
    for name, fn in (("vpatch", resample2d_patch), ("vflat", resample2d_flat),
                     ("vprod", resample2d_prod)):
        got = np.asarray(jax.jit(fn)(src, flow))
        err = np.abs(got - want).max()
        print(f"parity {name}: max|Δ|={err:.2e}", flush=True)

    for dtype in (jnp.float32, jnp.bfloat16):
        for name, fn in (
            ("v4gather", resample2d_reference),
            ("vpatch", resample2d_patch),
            ("vprod_f32gather", resample2d_prod),
        ):
            f = jax.jit(lambda im, fl, fn=fn: jax.vmap(fn)(im, fl))

            def mk(s, b):
                return fresh(s, (b, h, w, c), dtype), 15.0 * fresh(s + 5, (b, h, w, 2))

            t1 = timed_med(f, lambda s: mk(s, 2))
            t2 = timed_med(f, lambda s: mk(s, 6))
            m = (t2 - t1) / 4
            print(json.dumps({"metric": f"resample_{name}_{dtype.__name__}",
                              "marginal_ms": round(m * 1e3, 2),
                              "b2_ms": round(t1 * 1e3, 1), "b6_ms": round(t2 * 1e3, 1)}), flush=True)


if __name__ == "__main__":
    main()
