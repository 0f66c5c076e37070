"""Refinement-net general training (SURVEY.md C2 train path).

Reference: the OnAVOS-family Engine trains the DeepLabv3+ refinement net on
segmentation datasets (Mapillary/COCO/PASCAL then DAVIS) with proposal-
conditioned inputs before any per-video fine-tuning. Here: training examples
are synthesized from any DAVIS-layout dataset — every annotated frame yields
(crop + perturbed-coarse-mask channel) → GT-mask examples, optionally
augmented with lucid dreaming — and run through the generic DP train step.

  python -m premvos_tpu.train.train_refine --davis_root D --split train \
      --steps 5000 [--out ckpt/]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from premvos_tpu.config import RefineConfig
from premvos_tpu.data.davis import DavisDataset
from premvos_tpu.finetune.finetune import make_refine_examples
from premvos_tpu.models.deeplab import DeepLabV3Plus
from premvos_tpu.parallel.mesh import make_mesh
from premvos_tpu.train.losses import sigmoid_xent
from premvos_tpu.train.trainer import (
    create_train_state,
    make_dp_train_step,
    replicate_state,
    shard_train_batch,
)
from premvos_tpu.utils.logging import get_logger


def example_stream(ds: DavisDataset, cfg: RefineConfig, rng, max_objects=8,
                   pool_frames=64, image_hw=(480, 864)):
    """Host-side generator of (crops, targets) pools from annotated frames."""
    h, w = image_hw
    while True:
        seq = ds.sequences[rng.integers(0, len(ds.sequences))]
        data = ds.load_sequence(seq, h, w, max_objects)
        if not len(data["gt_labels"]):
            continue
        t = rng.integers(0, len(data["gt_labels"]))
        crops, tgts = make_refine_examples(
            data["frames"][t : t + 1], data["gt_labels"][t : t + 1],
            cfg.crop_size, cfg.box_margin, rng,
        )
        if len(crops):
            yield crops, tgts


def train_refine(
    ds: DavisDataset,
    cfg: RefineConfig = RefineConfig(),
    steps: int = 1000,
    batch_size: int = 8,
    learning_rate: float = 1e-4,
    seed: int = 0,
    mesh=None,
    params=None,
    image_hw=(480, 864),
    log_every: int = 100,
):
    log = get_logger()
    mesh = mesh or make_mesh()
    model = DeepLabV3Plus(cfg=cfg)
    rng = np.random.default_rng(seed)
    if params is None:
        params = model.init(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, cfg.crop_size, cfg.crop_size, 4)),
        )

    def loss_fn(p, batch):
        x, y = batch
        return sigmoid_xent(model.apply(p, x), y)

    tx = optax.adam(learning_rate)
    state = replicate_state(create_train_state(params, tx), mesh)
    step = make_dp_train_step(loss_fn, tx, mesh)

    n_dev = mesh.devices.size
    bs = max(batch_size - batch_size % n_dev, n_dev)
    stream = example_stream(ds, cfg, rng, image_hw=image_hw)
    buf_x, buf_y = [], []
    loss = float("nan")
    for it in range(steps):
        while len(buf_x) < bs:
            cx, cy = next(stream)
            buf_x.extend(cx)
            buf_y.extend(cy)
        x = np.stack(buf_x[:bs])
        y = np.stack(buf_y[:bs])
        del buf_x[:bs], buf_y[:bs]
        batch = shard_train_batch((jnp.asarray(x), jnp.asarray(y)), mesh)
        state, loss = step(state, batch)
        if log_every and (it + 1) % log_every == 0:
            log.info("refine step %d/%d loss %.4f", it + 1, steps, float(loss))
    return state.params, float(loss)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--davis_root", required=True)
    ap.add_argument("--split", default="train")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    ds = DavisDataset(args.davis_root, split=args.split)
    params, loss = train_refine(
        ds, steps=args.steps, batch_size=args.batch_size
    )
    if args.out:
        from premvos_tpu.utils.checkpoint import save_params

        save_params(args.out, params)
    print({"final_loss": loss})


if __name__ == "__main__":
    main()
