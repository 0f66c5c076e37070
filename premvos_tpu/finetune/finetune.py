"""Per-video fine-tuning on lucid-dream augmentations (SURVEY.md §3.2).

Reference: before inference on each video, PReMVOS fine-tunes the proposal
and refinement nets on ~2,500 lucid-dream augmentations of the annotated
first frame — the dominant wall-clock cost of the reference (~38 s/frame
amortized). TPU design:

  * augmentation is CPU-side (data/lucid.py) and streams batches to device;
  * the fine-tune step is the generic DP train step (train/trainer.py):
    independent videos shard across chips, or one video's batch shards
    data-parallel over the mesh;
  * the refinement net fine-tunes on (crop, coarse-mask-channel) → GT-mask
    examples synthesized from the augmentations exactly like the reference's
    proposal-conditioned inputs: the coarse channel is a randomly perturbed
    (dilated/eroded/shifted) version of the GT mask, teaching the net to
    snap imprecise proposals onto true boundaries.
"""

from __future__ import annotations

import cv2
import numpy as np
import optax

from premvos_tpu.config import FinetuneConfig, RefineConfig
from premvos_tpu.data.lucid import lucid_batch
from premvos_tpu.data.preprocess import IMAGENET_MEAN, IMAGENET_STD
from premvos_tpu.train.trainer import (
    create_train_state,
    make_dp_train_step,  # noqa: F401 (re-export for callers)
    make_pool_train_step,
    replicate_state,
    shard_train_batch,  # noqa: F401 (re-export for callers)
)


def build_lucid_pool(
    first_frame: np.ndarray,
    first_labels: np.ndarray,
    ft_cfg: FinetuneConfig = FinetuneConfig(),
    seed: int = 0,
) -> tuple:
    """Build ONE lucid-augmentation pool for a video, shared by both
    per-video fine-tunes (proposal + refinement) — augmentation is the
    host-side cost of fine-tuning, and both nets train on the same
    distribution, so generating it twice is pure waste."""
    rng = np.random.default_rng(seed)
    pool_n = min(ft_cfg.num_augmentations, max(ft_cfg.steps, 64))
    return lucid_batch(first_frame, first_labels, rng, pool_n)


def perturb_mask(mask: np.ndarray, rng) -> np.ndarray:
    """Simulate a coarse proposal mask from a GT mask (random morphological
    perturbation + shift)."""
    m = mask.astype(np.uint8)
    k = int(rng.integers(1, 6))
    kernel = np.ones((k, k), np.uint8)
    if rng.uniform() < 0.5:
        m = cv2.dilate(m, kernel)
    else:
        m = cv2.erode(m, kernel)
    dx, dy = rng.integers(-4, 5, size=2)
    m = np.roll(np.roll(m, dy, 0), dx, 1)
    return m.astype(np.float32)


def make_refine_examples(
    images: np.ndarray,
    labels: np.ndarray,
    crop_size: int,
    margin: float,
    rng,
) -> tuple[np.ndarray, np.ndarray]:
    """Augmented frames → (crops [M, S, S, 4], targets [M, S, S]).

    One example per (sample, object): RGB crop around the margin-expanded,
    jittered object box + a perturbed-coarse-mask channel; target is the true
    mask in the crop frame.
    """
    crops, targets = [], []
    s = crop_size
    for img, lab in zip(images, labels):
        h, w = lab.shape
        for obj in [int(i) for i in np.unique(lab) if i > 0]:
            m = (lab == obj).astype(np.float32)
            ys, xs = np.nonzero(m)
            if len(ys) < 4:
                continue
            jx, jy = rng.integers(-8, 9, size=2)
            x1 = max(0, xs.min() - margin + jx)
            y1 = max(0, ys.min() - margin + jy)
            x2 = min(w, xs.max() + margin + jx)
            y2 = min(h, ys.max() + margin + jy)
            if x2 - x1 < 8 or y2 - y1 < 8:
                continue
            rgb = img[int(y1) : int(y2), int(x1) : int(x2)]
            rgb = cv2.resize(rgb, (s, s)).astype(np.float32) / 255.0
            rgb = (rgb - IMAGENET_MEAN) / IMAGENET_STD
            coarse = perturb_mask(m, rng)[int(y1) : int(y2), int(x1) : int(x2)]
            coarse = cv2.resize(coarse, (s, s), interpolation=cv2.INTER_LINEAR)
            tgt = cv2.resize(
                m[int(y1) : int(y2), int(x1) : int(x2)], (s, s),
                interpolation=cv2.INTER_LINEAR,
            )
            crops.append(
                np.concatenate([rgb, coarse[..., None]], -1).astype(np.float32)
            )
            targets.append((tgt > 0.5).astype(np.float32))
    if not crops:
        return (
            np.zeros((0, s, s, 4), np.float32),
            np.zeros((0, s, s), np.float32),
        )
    return np.stack(crops), np.stack(targets)


def finetune_refine(
    model,
    params,
    first_frame: np.ndarray,
    first_labels: np.ndarray,
    mesh,
    refine_cfg: RefineConfig = RefineConfig(),
    ft_cfg: FinetuneConfig = FinetuneConfig(),
    seed: int = 0,
    log_every: int = 0,
    pool: tuple | None = None,
):
    """Fine-tune the refinement net on one video's first frame.

    Returns (new_params, final_loss). Batches shard data-parallel over the
    mesh; augmentation streams on the host. `pool` = a prebuilt
    (images, labels) lucid pool (see build_lucid_pool) — the same pool can
    serve both per-video fine-tunes, halving the host augmentation cost.
    """
    import jax.numpy as jnp

    from premvos_tpu.train.losses import sigmoid_xent

    rng = np.random.default_rng(seed)
    n_dev = mesh.devices.size
    bs = max(ft_cfg.batch_size, n_dev)
    bs -= bs % n_dev  # divisible by mesh

    def loss_fn(p, batch):
        x, y = batch
        logits = model.apply(p, x)
        return sigmoid_xent(logits, y)

    tx = optax.adam(ft_cfg.learning_rate)
    state = replicate_state(create_train_state(params, tx), mesh)

    # Pre-generate an augmentation pool, upload it ONCE; every step gathers
    # its batch on device (make_pool_train_step) — streaming batches from
    # the host measured 13.5 s/step through this platform's relay.
    if pool is None:
        pool_n = min(ft_cfg.num_augmentations, max(ft_cfg.steps, 64))
        pool = lucid_batch(first_frame, first_labels, rng, pool_n)
    imgs, labs = pool
    crops, tgts = make_refine_examples(
        imgs, labs, refine_cfg.crop_size, refine_cfg.box_margin, rng
    )
    if len(crops) == 0:
        return params, float("nan")

    import jax as _jax

    step, pool_d = make_pool_train_step(
        loss_fn, tx, mesh, (crops, tgts), bs
    )
    base_key = _jax.random.PRNGKey(seed)
    loss = float("nan")
    for it in range(ft_cfg.steps):
        state, loss = step(state, pool_d, base_key)
        if log_every and (it + 1) % log_every == 0:
            print(f"[finetune] step {it + 1}/{ft_cfg.steps} loss={float(loss):.4f}")
    return state.params, float(loss)


def labels_to_boxes_masks(labels: np.ndarray, max_objects: int):
    """[H, W] int label map → (boxes [K,4], masks [K,H,W], valid [K])."""
    h, w = labels.shape
    boxes = np.zeros((max_objects, 4), np.float32)
    masks = np.zeros((max_objects, h, w), np.float32)
    valid = np.zeros((max_objects,), bool)
    for slot, obj in enumerate(
        [int(i) for i in np.unique(labels) if i > 0][:max_objects]
    ):
        m = labels == obj
        ys, xs = np.nonzero(m)
        if len(ys) == 0:
            continue
        boxes[slot] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
        masks[slot] = m
        valid[slot] = True
    return boxes, masks, valid


def finetune_proposals(
    model,
    params,
    anchors,
    proposal_cfg,
    first_frame: np.ndarray,
    first_labels: np.ndarray,
    mesh,
    ft_cfg: FinetuneConfig = FinetuneConfig(),
    seed: int = 0,
    max_objects: int = 8,
    log_every: int = 0,
    pool: tuple | None = None,
):
    """Per-video fine-tune of the Mask R-CNN proposal net on lucid-dream
    augmentations (the reference fine-tunes this net too — SURVEY.md §3.2).

    first_frame must already be padded to the pipeline canvas. Returns
    (new_params, final_loss). `pool` = prebuilt (images, labels) lucid pool
    shared with finetune_refine (see build_lucid_pool)."""
    import jax
    import jax.numpy as jnp

    from premvos_tpu.data.preprocess import IMAGENET_MEAN, IMAGENET_STD
    from premvos_tpu.train.detection import maskrcnn_loss_fn

    rng = np.random.default_rng(seed)
    h, w = first_frame.shape[:2]
    n_dev = mesh.devices.size
    bs = max(1, ft_cfg.batch_size // 2)
    bs = max(bs - bs % n_dev, n_dev)

    if pool is None:
        pool_n = min(ft_cfg.num_augmentations, max(ft_cfg.steps, 64))
        pool = lucid_batch(first_frame, first_labels, rng, pool_n)
    imgs, labs = pool
    pool_n = len(imgs)

    gt = [labels_to_boxes_masks(l, max_objects) for l in labs]
    gt_boxes = np.stack([g[0] for g in gt])
    gt_masks = np.stack([g[1] for g in gt]).astype(np.uint8)
    gt_valid = np.stack([g[2] for g in gt])
    seeds = rng.integers(0, 2**31 - 1, size=pool_n).astype(np.uint32)

    base_loss = maskrcnn_loss_fn(model, anchors, proposal_cfg, (h, w))
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)

    def loss_fn(p, batch):
        # Pool stores uint8 images/masks (HBM + one-time upload are 4×
        # smaller); normalize/cast on device per batch.
        im, gb, gm, gv, sd = batch
        im = (im.astype(jnp.float32) / 255.0 - mean) / std
        return base_loss(p, (im, gb, gm.astype(jnp.float32), gv, sd))

    def resalt_seeds(batch, key):
        # Fold a fresh per-step salt into the per-item augmentation seeds so
        # resampling the same pool item yields a different augmentation each
        # step (the pool itself is static on device).
        im, gb, gm, gv, sd = batch
        salt = jax.random.randint(
            key, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
        ).astype(jnp.uint32)
        return im, gb, gm, gv, sd + salt

    tx = optax.adam(ft_cfg.learning_rate)
    state = replicate_state(create_train_state(params, tx), mesh)
    step, pool_d = make_pool_train_step(
        loss_fn, tx, mesh, (imgs, gt_boxes, gt_masks, gt_valid, seeds), bs,
        batch_transform=resalt_seeds,
    )
    base_key = jax.random.PRNGKey(seed)
    loss = float("nan")
    for it in range(ft_cfg.steps):
        state, loss = step(state, pool_d, base_key)
        if log_every and (it + 1) % log_every == 0:
            print(f"[finetune-prop] step {it + 1}/{ft_cfg.steps} loss={float(loss):.4f}")
    return state.params, float(loss)
