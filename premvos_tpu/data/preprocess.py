"""Image preprocessing: normalization, resize-and-pad to static shapes.

Reference: each stage does its own ad-hoc preprocessing (Mask R-CNN resize
in `data.py`, refinement crops in its dataset, flow net resize in `main.py`;
unverified — mount was empty). Here preprocessing is shared and static-shape:
DAVIS 480p frames (480×854) are padded to 480×864 (32-multiple) once, on
device, and every stage consumes that canvas.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# ImageNet statistics (the backbones' pretraining convention).
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def pad_to(image: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Zero-pad [..., H, W, C] bottom/right to the static canvas."""
    h, w = image.shape[-3:-1]
    pads = [(0, 0)] * (image.ndim - 3) + [
        (0, height - h),
        (0, width - w),
        (0, 0),
    ]
    return jnp.pad(image, pads)


def normalize(image: jnp.ndarray) -> jnp.ndarray:
    """uint8/float [0,255] or [0,1] RGB → ImageNet-normalized float32."""
    x = image.astype(jnp.float32)
    x = jnp.where(jnp.max(x) > 2.0, x / 255.0, x)  # tolerate both ranges
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def to_unit(image: jnp.ndarray) -> jnp.ndarray:
    """uint8 RGB → [0,1] float32 (flow net convention)."""
    return image.astype(jnp.float32) / 255.0
