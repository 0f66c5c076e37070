"""Mask R-CNN general training (SURVEY.md C1 train path).

Reference: the TF Mask R-CNN `train.py` (COCO pretraining, then category-
agnostic adaptation). Here: trains on any DAVIS-layout dataset — every
annotated frame yields (image, GT boxes/masks) — via the full detection loss
(train/detection.py) and the generic DP step. For COCO-scale pretraining,
point it at a COCO→DAVIS-layout conversion or extend the stream.

  python -m premvos_tpu.train.train_maskrcnn --davis_root D --split train \
      --steps 5000 [--height 480 --width 864] [--out ckpt/]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from premvos_tpu.config import ProposalConfig
from premvos_tpu.data.davis import DavisDataset
from premvos_tpu.data.preprocess import IMAGENET_MEAN, IMAGENET_STD
from premvos_tpu.finetune.finetune import labels_to_boxes_masks
from premvos_tpu.models.anchors import pyramid_anchors
from premvos_tpu.models.maskrcnn import MaskRCNN
from premvos_tpu.parallel.mesh import make_mesh
from premvos_tpu.train.detection import maskrcnn_loss_fn
from premvos_tpu.train.trainer import (
    create_train_state,
    make_dp_train_step,
    replicate_state,
    shard_train_batch,
)
from premvos_tpu.utils.logging import get_logger


def train_maskrcnn(
    ds: DavisDataset,
    cfg: ProposalConfig = ProposalConfig(),
    image_hw=(480, 864),
    max_objects: int = 8,
    steps: int = 1000,
    batch_size: int = 2,
    learning_rate: float = 1e-4,
    seed: int = 0,
    mesh=None,
    params=None,
    log_every: int = 100,
):
    log = get_logger()
    mesh = mesh or make_mesh()
    h, w = image_hw
    model = MaskRCNN(cfg=cfg)
    anchors = {
        k: jnp.asarray(v)
        for k, v in pyramid_anchors(h, w, cfg.anchor_scales, cfg.anchor_ratios).items()
    }
    rng = np.random.default_rng(seed)
    if params is None:
        params = model.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, h, w, 3)), anchors
        )

    loss_fn = maskrcnn_loss_fn(model, anchors, cfg, image_hw)
    tx = optax.adam(learning_rate)
    state = replicate_state(create_train_state(params, tx), mesh)
    step = make_dp_train_step(loss_fn, tx, mesh)

    n_dev = mesh.devices.size
    bs = max(batch_size - batch_size % n_dev, n_dev)
    loss = float("nan")
    for it in range(steps):
        imgs, gbs, gms, gvs = [], [], [], []
        while len(imgs) < bs:
            seq = ds.sequences[rng.integers(0, len(ds.sequences))]
            data = ds.load_sequence(seq, h, w, max_objects)
            if not len(data["gt_labels"]):
                continue
            t = rng.integers(0, len(data["gt_labels"]))
            boxes, masks, valid = labels_to_boxes_masks(
                data["gt_labels"][t], max_objects
            )
            if not valid.any():
                continue
            img = data["frames"][t].astype(np.float32) / 255.0
            imgs.append((img - IMAGENET_MEAN) / IMAGENET_STD)
            gbs.append(boxes)
            gms.append(masks)
            gvs.append(valid)
        seeds = rng.integers(0, 2**31 - 1, size=bs).astype(np.uint32)
        batch = shard_train_batch(
            (
                jnp.asarray(np.stack(imgs)),
                jnp.asarray(np.stack(gbs)),
                jnp.asarray(np.stack(gms)),
                jnp.asarray(np.stack(gvs)),
                jnp.asarray(seeds),
            ),
            mesh,
        )
        state, loss = step(state, batch)
        if log_every and (it + 1) % log_every == 0:
            log.info("maskrcnn step %d/%d loss %.4f", it + 1, steps, float(loss))
    return state.params, float(loss)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--davis_root", required=True)
    ap.add_argument("--split", default="train")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=864)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    ds = DavisDataset(args.davis_root, split=args.split)
    params, loss = train_maskrcnn(
        ds, image_hw=(args.height, args.width), steps=args.steps,
        batch_size=args.batch_size,
    )
    if args.out:
        from premvos_tpu.utils.checkpoint import save_params

        save_params(args.out, params)
    print({"final_loss": loss})


if __name__ == "__main__":
    main()
