"""On-device Lucid-Data-Dreaming augmentation (SURVEY.md §0/§3.2).

The reference consumes ~2,500 pre-generated lucid-dream augmentations per
video from disk (Khoreva et al. recipe: inpaint the background, re-composite
each object with independent geometric + photometric perturbations; expected
under the reference's fine-tune data dirs — unverified, mount empty). Round-3
profiling showed the host-side cv2 generator (`data/lucid.py`) costs
~0.113 s/aug on this 1-vCPU host — 56 s/video for a 500-aug pool and ~280 s
for the reference-parity 2,500, all dead time for the TPU.

This module is the TPU-native redesign: the ENTIRE augmentation pipeline is a
jitted pure function of (first frame, first masks, inpainted background,
PRNG key), so fresh augmentations are generated *inside the fine-tune train
step* at device speed — no pool, no host round-trips, unbounded augmentation
diversity (every step sees new draws, strictly better than the reference's
fixed 2,500-sample pool).

TPU-first design choices:

  * **Object-local patch warps.** Rotation/scale/elastic warps are applied on
    a fixed PxP patch around each object, not the full frame. A frame-center
    rotation decomposes exactly into a rotation about the object center plus
    a translation of the center; the translation is absorbed into the paste
    box. Patch extraction and paste-back are the MXU interpolation einsums
    (ops.roi_align.crop_and_resize / ops.masks.paste_mask); only the PxP
    rotation+elastic resample is a gather (65k indices at P=256, vs 414k for
    a full-frame 480p warp — and the gather is the one TPU-hostile op here).
  * **Static shapes throughout**: K = max_objects slots, invalid slots warp
    zeros; per-sample work is vmap-able and scan-able.
  * The host keeps exactly one job: Telea-inpainting the background, once
    per video (`data/lucid.py:inpaint_background`).

Distribution parity with the host generator (same parameter ranges:
rotation +-15 deg, scale 0.9-1.1, shift +-10%, elastic alpha=8/sigma=12 at
p=0.8, background rot +-5 deg / shift +-5%, photometric contrast 0.8-1.2 /
brightness +-20 / channel gain 0.9-1.1) is asserted statistically in
tests/test_finetune_fused.py. Differences (documented, accuracy-neutral):
elastic noise is generated at 1/8 resolution with a separable Gaussian blur
(spectrally equivalent — see data/lucid.py:_elastic_maps); objects whose
margin-expanded box exceeds the patch are warped at reduced patch resolution
(scale-to-fit) instead of native; and out-of-frame border samples differ —
the host oracle uses cv2.BORDER_REFLECT for the background warp and
BORDER_CONSTANT(0) for foreground warps, while the device path edge-clamps
(resample2d/resample2d_block pad mode). At the sampled ranges (bg shift
≤5 %, rot ≤5°) the affected band is ≤ ~30 edge pixels of a 480p frame and
carries near-duplicate content either way; foreground patches are centred
on the object so their borders are background that the paste discards.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from premvos_tpu.ops.masks import paste_mask
from premvos_tpu.ops.resample2d import resample2d_block
from premvos_tpu.ops.roi_align import crop_and_resize


def _deg2rad(d):
    return d * (jnp.pi / 180.0)


def _gauss_kernel(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def smooth_field(key, h: int, w: int, alpha: float = 8.0,
                 sigma: float = 12.0, ds: int = 8) -> jnp.ndarray:
    """Smooth random displacement field [h, w, 2] (LDD elastic recipe).

    White noise at 1/ds resolution, separable Gaussian blur at sigma/ds,
    bilinear upsample, scaled by alpha — spectrally equivalent to the
    full-res sigma-blur (a sigma-12 blur has no energy above ~1/12 px^-1;
    see data/lucid.py:_elastic_maps for the measured host-side argument).
    """
    sh, sw = max(h // ds, 4), max(w // ds, 4)
    noise = jax.random.uniform(key, (2, sh, sw), jnp.float32, -1.0, 1.0)
    s = sigma / ds
    r = max(int(3 * s + 0.5), 1)
    k = _gauss_kernel(s, r)
    # separable blur: rows then cols (conv via dot with shifted slices is
    # wasteful; use conv_general_dilated on a [2, sh, sw, 1] batch)
    x = noise[..., None]
    kx = k.reshape(1, -1, 1, 1)
    ky = k.reshape(-1, 1, 1, 1)
    dn = jax.lax.conv_dimension_numbers(x.shape, kx.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(x, ky, (1, 1), [(r, r), (0, 0)], dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, kx, (1, 1), [(0, 0), (r, r)], dimension_numbers=dn)
    field = jax.image.resize(x[..., 0] * alpha, (2, h, w), method="bilinear")
    return jnp.moveaxis(field, 0, -1)  # [h, w, 2] (dx, dy)


def sample_affine(key, max_rot: float, scale_lo: float, scale_hi: float,
                  max_shift_x: float, max_shift_y: float):
    """Draw (angle_rad, scale, shift_x, shift_y) matching data/lucid.py's
    _rand_affine distribution (shift in pixels given max_shift_* already
    scaled by w/h)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    ang = _deg2rad(jax.random.uniform(k1, (), jnp.float32, -max_rot, max_rot))
    sc = jax.random.uniform(k2, (), jnp.float32, scale_lo, scale_hi)
    tx = jax.random.uniform(k3, (), jnp.float32, -max_shift_x, max_shift_x)
    ty = jax.random.uniform(k4, (), jnp.float32, -max_shift_y, max_shift_y)
    return ang, sc, tx, ty


def photometric(key, img255):
    """Contrast/brightness/channel-gain jitter on a 0..255-scale image
    (same ranges as data/lucid.py:_photometric)."""
    k1, k2, k3 = jax.random.split(key, 3)
    c = jax.random.uniform(k1, (), jnp.float32, 0.8, 1.2)
    b = jax.random.uniform(k2, (), jnp.float32, -20.0, 20.0)
    g = jax.random.uniform(k3, (3,), jnp.float32, 0.9, 1.1)
    return jnp.clip((img255 * c + b) * g, 0.0, 255.0)


def _rot_scale_flow(p: int, ang, scale, elastic):
    """Inverse-map displacement field for a rotation+scale about the patch
    center, plus an elastic displacement: flow[y, x] = src - target, the
    resample2d convention. elastic: [p, p, 2] or None."""
    c = (p - 1) / 2.0
    yy = jnp.arange(p, dtype=jnp.float32)[:, None] - c
    xx = jnp.arange(p, dtype=jnp.float32)[None, :] - c
    cos = jnp.cos(ang) / scale
    sin = jnp.sin(ang) / scale
    # inverse of rotation-by-ang, scale-by-s (about center)
    sx = cos * xx + sin * yy - xx
    sy = -sin * xx + cos * yy - yy
    flow = jnp.stack(
        [jnp.broadcast_to(sx, (p, p)), jnp.broadcast_to(sy, (p, p))], axis=-1
    )
    if elastic is not None:
        flow = flow + elastic
    return flow


def mask_center_size(mask: jnp.ndarray):
    """[H, W] soft mask -> (cy, cx, size, any) with size the larger tight
    box side (degenerate-safe)."""
    h, w = mask.shape
    on = mask > 0.5
    cols = jnp.any(on, axis=0)
    rows = jnp.any(on, axis=1)
    xi = jnp.arange(w, dtype=jnp.float32)
    yi = jnp.arange(h, dtype=jnp.float32)
    big = jnp.float32(1e9)
    x1 = jnp.min(jnp.where(cols, xi, big))
    x2 = jnp.max(jnp.where(cols, xi, -big))
    y1 = jnp.min(jnp.where(rows, yi, big))
    y2 = jnp.max(jnp.where(rows, yi, -big))
    any_on = jnp.any(on)
    cy = jnp.where(any_on, (y1 + y2) / 2, h / 2.0)
    cx = jnp.where(any_on, (x1 + x2) / 2, w / 2.0)
    size = jnp.where(any_on, jnp.maximum(x2 - x1, y2 - y1) + 1.0, 1.0)
    return cy, cx, size, any_on


def lucid_frame(
    key,
    image255: jnp.ndarray,
    masks: jnp.ndarray,
    valid: jnp.ndarray,
    background255: jnp.ndarray,
    patch: int = 256,
    elastic_prob: float = 0.8,
    interp_precision=None,
):
    """One on-device lucid-dream draw.

    image255: [H, W, 3] float32 0..255 first frame; masks: [K, H, W] binary
    first-frame object masks; valid: [K] bool; background255: [H, W, 3]
    inpainted background. Returns (canvas255 [H, W, 3], out_masks [K, H, W]
    float 0/1) — out_masks are post-composite (later slots occlude earlier,
    matching data/lucid.py's overwrite order).
    """
    h, w, _ = image255.shape
    kk = jax.random.split(key, 2 + masks.shape[0])
    k_bg, k_bgp = kk[0], kk[1]
    obj_keys = kk[2:]

    # ---- background: full-frame affine (rot <=5 deg, shift <=5%) ----
    ang, sc, tx, ty = sample_affine(k_bg, 5.0, 0.9, 1.1, 0.05 * w, 0.05 * h)
    c_y, c_x = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] - c_y
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] - c_x
    cos, sin = jnp.cos(ang) / sc, jnp.sin(ang) / sc
    # inverse map includes undoing the translation
    fx = cos * (xx - tx) + sin * (yy - ty) - xx
    fy = -sin * (xx - tx) + cos * (yy - ty) - yy
    bg_flow = jnp.stack(
        [jnp.broadcast_to(fx, (h, w)), jnp.broadcast_to(fy, (h, w))], -1
    )
    # Full-frame affine via the block-sliced warp: the per-pixel gather
    # formulation cost 190 s compile + 0.88 s/draw at 480p on TPU (measured
    # round 4); with (16,16) blocks the affine's within-block displacement
    # spread (≈0.12·extent for rot ≤5°/scale 0.9–1.1) stays inside the
    # residual-4 window, so this is EXACT (2e-4 of 255) at 4 s compile /
    # ~10 ms device. max_flow 160 covers the corner displacement (≤120 px
    # at 480p). XLA path: (16,16) blocks waste the Pallas kernel's 128-lane
    # tiles, and one warp per draw doesn't need manual DMA.
    canvas = resample2d_block(
        background255, bg_flow, block=(16, 16), residual=4, max_flow=160,
        use_pallas=False,
    )
    canvas = photometric(k_bgp, canvas)

    # ---- objects: patch-local rot/scale/elastic + paste at shifted center --
    def one_object(k, mask):
        ks = jax.random.split(k, 4)
        ang, sc, tx, ty = sample_affine(
            ks[0], 15.0, 0.9, 1.1, 0.1 * w, 0.1 * h
        )
        cy, cx, size, any_on = mask_center_size(mask)
        # native-resolution patch when the object fits; scale-to-fit above
        src_half = jnp.maximum(patch / 2.0, size * 0.75)
        box = jnp.stack(
            [
                (cy - src_half) / (h - 1),
                (cx - src_half) / (w - 1),
                (cy + src_half - 1) / (h - 1),
                (cx + src_half - 1) / (w - 1),
            ]
        )
        packed = jnp.concatenate([image255, mask[..., None] * 255.0], -1)
        pat = crop_and_resize(
            packed, box[None], patch, interp_precision
        )[0]  # [P, P, 4]
        elastic = smooth_field(ks[1], patch, patch)
        use_el = jax.random.uniform(ks[2], ()) < elastic_prob
        elastic = jnp.where(use_el, elastic, jnp.zeros_like(elastic))
        # the patch may be scale-to-fit resampled: elastic units are native
        # pixels, so rescale the field into patch units
        elastic = elastic * (patch / (2.0 * src_half))
        flow = _rot_scale_flow(patch, ang, sc, elastic)
        # Patch warp via the block-sliced residual-window path, NOT a
        # per-pixel gather. Round-5 decomposition on TPU (single-dispatch
        # probes, /tmp records in docs/MEMORY_BUDGET.md §dispatch): the
        # fused refine step at 480p was 7.0 s of which the model
        # fwd+bwd+adam was 0.05 s — 99 % was lucid_frame, dominated by
        # these K×batch = 64 per-pixel 256² gathers (~60 ms each,
        # scalarized addressing; an earlier in-repo note claiming the
        # gather was faster than the block path was a mismeasurement —
        # this platform memoizes identical buffers, README "Timing
        # methodology"). Envelope: rot ≤15°/scale 0.9–1.1 gives flow
        # gradients ≤ ~0.3 px/px and the elastic field ≤ ~0.4 at 3σ
        # (amplitude 8·blurred-noise over σ=12 px), so an (8,8) block's
        # within-block displacement spread stays ≤ ~4 px < residual 6;
        # rarer outlier pixels clamp to the window edge — augmentation
        # jitter, documented with the other border-mode deviations above.
        warped = resample2d_block(
            pat, flow, block=(8, 8), residual=6, max_flow=64,
            use_pallas=False,
        )  # [P, P, 4]
        rgb = photometric(ks[3], warped[..., :3])
        m = warped[..., 3] / 255.0
        # destination: same-size box at the shifted center (frame-center
        # rotation == object-center rotation + center translation; the
        # reference shifts are uniform anyway, so folding the rotation's
        # center displacement into the shift draw is distribution-neutral)
        dst = jnp.stack(
            [cx + tx - src_half, cy + ty - src_half,
             cx + tx + src_half - 1, cy + ty + src_half - 1]
        )  # xyxy for paste_mask
        paste = lambda ch: paste_mask(ch, dst, h, w, interp_precision)
        rgb_full = jax.vmap(paste, in_axes=-1, out_axes=-1)(rgb)
        m_full = paste(m) * jnp.where(any_on, 1.0, 0.0)
        return rgb_full, m_full

    # Composite ascending (later objects overwrite earlier — host parity),
    # INCREMENTALLY under lax.scan: warping all K objects first (vmap) then
    # compositing materializes [K, H, W, 3] full-frame pastes per example —
    # ~40 MB per example at 480p, ~320 MB across a batch-8 vmap, a major
    # slice of the round-4 fused-finetune OOM (docs/MEMORY_BUDGET.md). The
    # scan carries one (canvas, label) pair instead; per-object warp work is
    # identical and the batch vmap supplies the parallelism.
    k_slots = masks.shape[0]

    def comp_body(carry, xs):
        cv, label = carry
        idx, k, mask, v = xs
        rgb_full, m_full = one_object(k, mask)
        sel = jnp.logical_and(m_full > 0.5, v)
        cv = jnp.where(sel[..., None], rgb_full, cv)
        label = jnp.where(sel, idx + 1, label)
        return (cv, label), None

    (canvas, label), _ = jax.lax.scan(
        comp_body,
        (canvas, jnp.zeros((h, w), jnp.int32)),
        (
            jnp.arange(k_slots, dtype=jnp.int32),
            obj_keys,
            masks,
            valid.astype(bool),
        ),
    )
    out_masks = (
        label[None] == (jnp.arange(k_slots) + 1)[:, None, None]
    ).astype(jnp.float32)
    return canvas, out_masks


def lucid_batch_device(key, image255, masks, valid, background255, n: int,
                       patch: int = 256, interp_precision=None):
    """n independent draws: returns (canvas [n, H, W, 3], masks
    [n, K, H, W]). vmap of lucid_frame — jit at the call site."""
    keys = jax.random.split(key, n)
    return jax.vmap(
        lambda k: lucid_frame(
            k, image255, masks, valid, background255, patch,
            interp_precision=interp_precision,
        )
    )(keys)


# ---------------------------------------------------------------------------
# coarse-mask perturbation (device equivalent of finetune.perturb_mask)
# ---------------------------------------------------------------------------


def _pool(m, k, op):
    pad = k // 2
    return jax.lax.reduce_window(
        m, -jnp.inf if op == "max" else jnp.inf,
        jax.lax.max if op == "max" else jax.lax.min,
        (k, k), (1, 1), [(pad, pad), (pad, pad)],
    )


def perturb_mask_device(key, mask: jnp.ndarray) -> jnp.ndarray:
    """Random morphological dilate/erode (k in 1..5) + shift (+-4 px): the
    device twin of finetune.perturb_mask, simulating a coarse proposal from
    a GT mask."""
    k1, k2, k3 = jax.random.split(key, 3)
    branch = jax.random.randint(k1, (), 0, 5)
    m = jax.lax.switch(
        branch,
        [
            lambda x: x,
            lambda x: _pool(x, 3, "max"),
            lambda x: _pool(x, 5, "max"),
            lambda x: _pool(x, 3, "min"),
            lambda x: _pool(x, 5, "min"),
        ],
        mask,
    )
    dxy = jax.random.randint(k2, (2,), -4, 5)
    m = jnp.roll(m, (dxy[0], dxy[1]), axis=(0, 1))
    return m
