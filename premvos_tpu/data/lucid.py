"""Lucid-Data-Dreaming-style first-frame augmentation (SURVEY.md §0/§3.2).

Reference: PReMVOS fine-tunes the proposal and refinement nets per video on
~2,500 augmentations of the annotated first frame (Khoreva et al., "Lucid
Data Dreaming for Video Object Segmentation"). The reference consumes
pre-generated augmentations from disk; generation itself follows the LDD
recipe: separate foreground objects from the (inpainted) background, apply
independent geometric + photometric perturbations to each, re-composite.

This is a CPU-side numpy/cv2 generator feeding the on-device fine-tune loop
(premvos_tpu.finetune); samples stream to the device in batches.
"""

from __future__ import annotations

import cv2
import numpy as np


def _rand_affine(rng, h, w, max_rot=15.0, scale_lo=0.9, scale_hi=1.1, max_shift=0.1):
    ang = rng.uniform(-max_rot, max_rot)
    scale = rng.uniform(scale_lo, scale_hi)
    m = cv2.getRotationMatrix2D((w / 2, h / 2), ang, scale)
    m[0, 2] += rng.uniform(-max_shift, max_shift) * w
    m[1, 2] += rng.uniform(-max_shift, max_shift) * h
    return m


def _photometric(rng, img):
    out = img.astype(np.float32)
    out = out * rng.uniform(0.8, 1.2)  # contrast
    out = out + rng.uniform(-20, 20)  # brightness
    # per-channel gain (illumination color shift)
    out = out * rng.uniform(0.9, 1.1, size=(1, 1, 3))
    return np.clip(out, 0, 255).astype(np.uint8)


def inpaint_background(image: np.ndarray, labels: np.ndarray) -> np.ndarray:
    """Remove all foreground objects via Telea inpainting."""
    mask = (labels > 0).astype(np.uint8)
    mask = cv2.dilate(mask, np.ones((5, 5), np.uint8))
    return cv2.inpaint(image, mask, 5, cv2.INPAINT_TELEA)


def _elastic_maps(rng, h, w, alpha: float = 8.0, sigma: float = 12.0):
    """Smooth random displacement fields for non-rigid (thin-plate-style)
    deformation — the LDD recipe deforms objects non-rigidly, not just
    affinely.

    The field is generated at 1/8 resolution and bilinearly upsampled: a
    sigma-12 blur of white noise has no energy above ~1/12 px⁻¹, so the
    low-res field is spectrally equivalent while the blur is ~40× cheaper
    (this is the dominant host cost of lucid augmentation — 63 ms/object
    at 480p full-res vs ~2 ms low-res, measured on the build host)."""
    ds = 8
    sh, sw = max(h // ds, 4), max(w // ds, 4)
    dx = cv2.GaussianBlur(
        rng.uniform(-1, 1, (sh, sw)).astype(np.float32), (0, 0), sigma / ds
    ) * alpha
    dy = cv2.GaussianBlur(
        rng.uniform(-1, 1, (sh, sw)).astype(np.float32), (0, 0), sigma / ds
    ) * alpha
    dx = cv2.resize(dx, (w, h), interpolation=cv2.INTER_LINEAR)
    dy = cv2.resize(dy, (w, h), interpolation=cv2.INTER_LINEAR)
    xx, yy = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    return xx + dx, yy + dy


def elastic_deform(image, mask, rng, alpha: float = 8.0, sigma: float = 12.0):
    """Apply one smooth non-rigid warp to (image, mask) jointly."""
    h, w = mask.shape
    mx, my = _elastic_maps(rng, h, w, alpha, sigma)
    img_w = cv2.remap(image, mx, my, cv2.INTER_LINEAR,
                      borderMode=cv2.BORDER_REFLECT)
    m_w = cv2.remap(mask.astype(np.uint8), mx, my, cv2.INTER_NEAREST)
    return img_w, m_w


def lucid_dream(
    image: np.ndarray,
    labels: np.ndarray,
    rng: np.random.Generator,
    background: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """One augmented (image, labels) pair from an annotated frame.

    image: [H, W, 3] uint8; labels: [H, W] int (0 = background).
    Each object gets its own affine + photometric perturbation; the
    background gets an independent affine + photometric change.
    """
    h, w = labels.shape
    if background is None:
        background = inpaint_background(image, labels)

    bg_m = _rand_affine(rng, h, w, max_rot=5.0, max_shift=0.05)
    canvas = cv2.warpAffine(
        background, bg_m, (w, h), borderMode=cv2.BORDER_REFLECT
    )
    canvas = _photometric(rng, canvas)
    out_labels = np.zeros((h, w), labels.dtype)

    for obj in [i for i in np.unique(labels) if i > 0]:
        m = (labels == obj).astype(np.uint8)
        fg = image * m[..., None]
        am = _rand_affine(rng, h, w)
        fg_w = cv2.warpAffine(fg, am, (w, h))
        m_w = cv2.warpAffine(m, am, (w, h), flags=cv2.INTER_NEAREST)
        if rng.uniform() < 0.8:  # non-rigid deformation on top of the affine
            fg_w, m_w = elastic_deform(fg_w, m_w, rng)
        fg_w = _photometric(rng, fg_w)
        sel = m_w.astype(bool)
        canvas[sel] = fg_w[sel]
        out_labels[sel] = obj
    return canvas, out_labels


def lucid_batch(image, labels, rng, n: int, background=None):
    """Generate n augmentations; returns (images [n,H,W,3], labels [n,H,W])."""
    if background is None:
        background = inpaint_background(image, labels)
    imgs, labs = [], []
    for _ in range(n):
        i, l = lucid_dream(image, labels, rng, background)
        imgs.append(i)
        labs.append(l)
    return np.stack(imgs), np.stack(labs)
