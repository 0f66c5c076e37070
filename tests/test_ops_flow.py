import jax
import jax.numpy as jnp
import numpy as np

from premvos_tpu.ops import channelnorm, correlation_reference, resample2d
from premvos_tpu.ops.correlation import correlation_mxu, displacement_grid


def numpy_correlation(f1, f2, md=4, stride=2):
    h, w, c = f1.shape
    d = 2 * (md // stride) + 1
    f2p = np.pad(f2, ((md, md), (md, md), (0, 0)))
    out = np.zeros((h, w, d * d), np.float32)
    k = 0
    for dy in range(-md, md + 1, stride):
        for dx in range(-md, md + 1, stride):
            shifted = f2p[md + dy : md + dy + h, md + dx : md + dx + w]
            out[..., k] = (f1 * shifted).sum(-1) / c
            k += 1
    return out


def test_correlation_reference_matches_numpy(rng):
    f1 = rng.standard_normal((10, 12, 6)).astype(np.float32)
    f2 = rng.standard_normal((10, 12, 6)).astype(np.float32)
    got = np.asarray(correlation_reference(jnp.array(f1), jnp.array(f2), 4, 2))
    np.testing.assert_allclose(got, numpy_correlation(f1, f2, 4, 2), rtol=1e-4, atol=1e-5)


def test_correlation_mxu_matches_reference(rng):
    f1 = rng.standard_normal((9, 14, 8)).astype(np.float32)
    f2 = rng.standard_normal((9, 14, 8)).astype(np.float32)
    a = np.asarray(correlation_reference(jnp.array(f1), jnp.array(f2), 4, 2))
    b = np.asarray(correlation_mxu(jnp.array(f1), jnp.array(f2), 4, 2))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_correlation_zero_displacement_channel(rng):
    # The center channel is the plain dot product f1·f2 / C.
    f1 = rng.standard_normal((6, 6, 4)).astype(np.float32)
    f2 = rng.standard_normal((6, 6, 4)).astype(np.float32)
    disps, d = displacement_grid(4, 2)
    center = int(np.where((np.asarray(disps) == 0).all(-1))[0][0])
    vol = np.asarray(correlation_reference(jnp.array(f1), jnp.array(f2), 4, 2))
    np.testing.assert_allclose(
        vol[..., center], (f1 * f2).sum(-1) / 4, rtol=1e-5, atol=1e-6
    )


def test_resample2d_zero_flow_identity(rng):
    src = rng.standard_normal((8, 9, 3)).astype(np.float32)
    flow = np.zeros((8, 9, 2), np.float32)
    out = np.asarray(resample2d(jnp.array(src), jnp.array(flow)))
    np.testing.assert_allclose(out, src, rtol=1e-6)


def test_resample2d_integer_shift(rng):
    src = rng.standard_normal((8, 8, 2)).astype(np.float32)
    flow = np.zeros((8, 8, 2), np.float32)
    flow[..., 0] = 2.0  # sample from x+2
    out = np.asarray(resample2d(jnp.array(src), jnp.array(flow)))
    np.testing.assert_allclose(out[:, :6], src[:, 2:], rtol=1e-6)


def test_resample2d_subpixel(rng):
    # Linear image → bilinear sampling is exact for interior pixels.
    yy, xx = np.mgrid[0:8, 0:8].astype(np.float32)
    src = (xx + 10 * yy)[..., None]
    flow = np.full((8, 8, 2), 0.5, np.float32)
    out = np.asarray(resample2d(jnp.array(src), jnp.array(flow)))[..., 0]
    expect = (xx + 0.5) + 10 * (yy + 0.5)
    np.testing.assert_allclose(out[:7, :7], expect[:7, :7], rtol=1e-5)


def test_resample2d_nearest_mask(rng):
    mask = (rng.uniform(0, 1, (8, 8, 1)) > 0.5).astype(np.float32)
    flow = np.zeros((8, 8, 2), np.float32)
    flow[..., 1] = 1.0
    out = np.asarray(resample2d(jnp.array(mask), jnp.array(flow), mode="nearest"))
    np.testing.assert_allclose(out[:7], mask[1:])
    assert set(np.unique(out)) <= {0.0, 1.0}


def test_channelnorm(rng):
    x = rng.standard_normal((4, 5, 7)).astype(np.float32)
    got = np.asarray(channelnorm(jnp.array(x)))
    np.testing.assert_allclose(
        got[..., 0], np.linalg.norm(x, axis=-1), rtol=1e-5, atol=1e-6
    )


def test_ops_are_jittable(rng):
    f1 = jnp.array(rng.standard_normal((6, 6, 4)), jnp.float32)
    f2 = jnp.array(rng.standard_normal((6, 6, 4)), jnp.float32)
    jax.jit(lambda a, b: correlation_mxu(a, b, 4, 2))(f1, f2)
    flow = jnp.zeros((6, 6, 2))
    jax.jit(resample2d)(f1[..., :3], flow)


def test_warp_masks_coarse_close_to_exact(rng):
    """stride=4 coarse warp ≈ exact warp for smooth blobs + smooth flow."""
    import jax.numpy as jnp

    from premvos_tpu.stages.flow import warp_masks, warp_masks_coarse

    h, w = 64, 96
    yy, xx = np.mgrid[0:h, 0:w]
    masks = np.stack(
        [
            (np.exp(-(((yy - 30) / 12.0) ** 2 + ((xx - 40) / 15.0) ** 2))),
            (np.exp(-(((yy - 20) / 8.0) ** 2 + ((xx - 70) / 10.0) ** 2))),
        ]
    ).astype(np.float32)
    flow = np.stack(
        [3.0 + 0.01 * yy, -2.0 + 0.01 * xx], axis=-1
    ).astype(np.float32)
    exact = np.asarray(warp_masks(jnp.asarray(masks), jnp.asarray(flow)))
    coarse = np.asarray(
        warp_masks_coarse(jnp.asarray(masks), jnp.asarray(flow), 4)
    )
    # Pointwise peaks soften at stride 4; what the merge consumes is the
    # soft-IoU against proposals, so the operative bound is overlap-level.
    assert np.abs(exact - coarse).mean() < 0.01
    inter = np.minimum(exact, coarse).sum(axis=(1, 2))
    union = np.maximum(exact, coarse).sum(axis=(1, 2))
    # the 8px-σ blob is a near-worst case (≈2px at stride 4)
    assert (inter / union > 0.85).all()
    # stride=1 is exactly the exact path
    one = np.asarray(
        warp_masks_coarse(jnp.asarray(masks), jnp.asarray(flow), 1)
    )
    np.testing.assert_array_equal(one, exact)


def test_resample2d_block_exact_on_smooth_flow(rng):
    """The block-sliced residual-window warp is EXACT (fp tolerance) against
    the gather reference for smooth flows — constants, low-frequency fields,
    border clamp zones, and non-block-multiple shapes."""
    import numpy as np

    from premvos_tpu.ops.resample2d import resample2d_block, resample2d_reference

    h, w, c = 61, 93, 3  # deliberately not block multiples
    src = jnp.array(rng.standard_normal((h, w, c)), jnp.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    smooth = jnp.array(
        np.stack(
            [9.0 + 3 * np.sin(2 * np.pi * yy / 48),
             -6.0 + 2 * np.cos(2 * np.pi * xx / 40)], -1
        ),
        jnp.float32,
    )
    for flow in (
        jnp.zeros((h, w, 2), jnp.float32),
        jnp.full((h, w, 2), 17.3, jnp.float32),
        jnp.full((h, w, 2), -23.7, jnp.float32),
        jnp.full((h, w, 2), 500.0, jnp.float32),  # full out-of-image clamp
        smooth,
    ):
        ref = resample2d_reference(src, flow)
        blk = resample2d_block(src, flow)
        np.testing.assert_allclose(np.asarray(blk), np.asarray(ref), atol=1e-4)


def test_resample2d_block_fallback_bounded(rng):
    """Non-smooth flow (iid noise — beyond the residual window) degrades
    gracefully: finite, and bounded by the source value range (it is still a
    convex combination of source pixels)."""
    from premvos_tpu.ops.resample2d import resample2d_block

    src = jnp.array(rng.uniform(0, 1, (40, 56, 2)), jnp.float32)
    flow = jnp.array(rng.uniform(-30, 30, (40, 56, 2)), jnp.float32)
    out = resample2d_block(src, flow)
    assert bool(jnp.isfinite(out).all())
    assert float(out.min()) >= -1e-5 and float(out.max()) <= 1.0 + 1e-5


def test_warp_masks_block_matches_gather(rng):
    """warp_masks default (packed-channel block path) == per-mask gather
    path for smooth flow."""
    import numpy as np

    from premvos_tpu.stages.flow import warp_masks

    k, h, w = 5, 48, 64
    masks = (rng.uniform(0, 1, (k, h, w)) > 0.7).astype(np.float32)
    masks = jnp.array(masks)
    flow = jnp.full((h, w, 2), 3.4, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(warp_masks(masks, flow, impl="block")),
        np.asarray(warp_masks(masks, flow, impl="gather")),
        atol=1e-5,
    )


@__import__("pytest").mark.slow
def test_flownet2_block_warp_close_to_gather(rng):
    """Full FlowNet2 stack with block in-net warps stays close to the
    gather-warp stack (random weights; in-net flows are smooth by
    construction — upsampled from 1/4-res predictions)."""
    import numpy as np

    from premvos_tpu.models import FlowNet2

    img1 = jnp.array(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    img2 = jnp.array(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    mb = FlowNet2(variant="flownet2", max_displacement=4, warp_impl="block")
    mg = FlowNet2(variant="flownet2", max_displacement=4, warp_impl="gather")
    params = jax.jit(mb.init)(jax.random.PRNGKey(0), img1, img2)
    fb = mb.apply(params, img1, img2)
    fg = mg.apply(params, img1, img2)
    np.testing.assert_allclose(np.asarray(fb), np.asarray(fg), atol=5e-4)


def test_resample2d_block_pallas_interpret_parity(rng):
    """Pallas kernel (interpret mode) == XLA block path == gather reference
    on smooth flow, including packed multi-channel masks."""
    import numpy as np

    from premvos_tpu.ops.pallas.resample2d_pallas import resample2d_block_pallas
    from premvos_tpu.ops.resample2d import resample2d_block, resample2d_reference

    h, w = 64, 96
    src = jnp.array(rng.standard_normal((h, w, 3)), jnp.float32)
    flow = jnp.full((h, w, 2), 7.6, jnp.float32)
    ref = resample2d_reference(src, flow)
    pk = resample2d_block_pallas(src, flow, interpret=True)
    np.testing.assert_allclose(np.asarray(pk), np.asarray(ref), atol=1e-4)

    masks = jnp.array(
        (rng.uniform(0, 1, (h, w, 8)) > 0.7).astype(np.float32)
    )
    xla = resample2d_block(masks, flow, use_pallas=False)
    pk = resample2d_block_pallas(masks, flow, interpret=True)
    np.testing.assert_allclose(np.asarray(pk), np.asarray(xla), atol=1e-5)
