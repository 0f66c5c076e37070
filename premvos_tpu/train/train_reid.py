"""ReID training engine: batch-hard triplet over PK batches (SURVEY.md C4).

Reference: the OnAVOS-family `ReID_net` Engine/Trainer with a triplet-loss
layer, trained on COCO/PASCAL crops. Here: the generic DP train step + the
InstanceCropDataset PK sampler.

  python -m premvos_tpu.train.train_reid --images <dir> \
      --annotations instances.json --steps 1000 [--out ckpt/]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from premvos_tpu.config import ReIDConfig
from premvos_tpu.data.crops import InstanceCropDataset
from premvos_tpu.data.preprocess import IMAGENET_MEAN, IMAGENET_STD
from premvos_tpu.models.reid import ReIDNet
from premvos_tpu.parallel.mesh import make_mesh
from premvos_tpu.train.losses import batch_hard_triplet
from premvos_tpu.train.trainer import (
    create_train_state,
    make_dp_train_step,
    replicate_state,
    shard_train_batch,
)
from premvos_tpu.utils.logging import get_logger


def train_reid(
    dataset: InstanceCropDataset,
    cfg: ReIDConfig = ReIDConfig(),
    steps: int = 1000,
    p: int = 8,
    k: int = 4,
    learning_rate: float = 1e-4,
    seed: int = 0,
    mesh=None,
    params=None,
    log_every: int = 100,
):
    """Returns (params, last_loss). Batch = P·K crops; P·K must divide by
    the mesh size (identities stay within a shard for batch-hard mining)."""
    log = get_logger()
    mesh = mesh or make_mesh()
    model = ReIDNet(cfg=cfg)
    rng = np.random.default_rng(seed)

    if params is None:
        params = model.init(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, cfg.crop_size, cfg.crop_size, 3)),
        )

    def loss_fn(pr, batch):
        crops, ids = batch
        emb = model.apply(pr, crops)
        return batch_hard_triplet(emb, ids, cfg.triplet_margin)

    tx = optax.adam(learning_rate)
    state = replicate_state(create_train_state(params, tx), mesh)
    step = make_dp_train_step(loss_fn, tx, mesh)

    n_dev = mesh.devices.size
    loss = float("nan")
    for it in range(steps):
        # One PK group per device shard so hard mining sees full identities.
        crops, ids = [], []
        for d in range(n_dev):
            c, i = dataset.pk_batch(rng, p, k)
            crops.append((c - IMAGENET_MEAN) / IMAGENET_STD)
            ids.append(i + d * p)  # unique ids per shard (cosmetic)
        batch = shard_train_batch(
            (jnp.asarray(np.concatenate(crops)), jnp.asarray(np.concatenate(ids))),
            mesh,
        )
        state, loss = step(state, batch)
        if log_every and (it + 1) % log_every == 0:
            log.info("reid step %d/%d loss %.4f", it + 1, steps, float(loss))
    return state.params, float(loss)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--annotations", required=True)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    ds = InstanceCropDataset(args.images, args.annotations)
    params, loss = train_reid(ds, steps=args.steps)
    if args.out:
        from premvos_tpu.utils.checkpoint import save_params

        save_params(args.out, params)
    print({"final_loss": loss})


if __name__ == "__main__":
    main()
