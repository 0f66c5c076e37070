"""Flow training engine: multi-scale EPE on FlowNetC/S (SURVEY.md C3).

Reference: flownet2-pytorch's `main.py` argparse train loop with
`MultiScale` loss on FlyingChairs/Things. Here: the generic DP train step +
the FlowPairDataset.

  python -m premvos_tpu.train.train_flow --data <chairs_dir> \
      --steps 1000 [--variant flownetc] [--out ckpt/]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from premvos_tpu.data.flow_pairs import FlowPairDataset
from premvos_tpu.models.flownet import FlowNetC
from premvos_tpu.parallel.mesh import make_mesh
from premvos_tpu.train.losses import multiscale_epe
from premvos_tpu.train.trainer import (
    create_train_state,
    make_dp_train_step,
    replicate_state,
    shard_train_batch,
)
from premvos_tpu.utils.logging import get_logger

DIV_FLOW = 20.0


def train_flownet_c(
    dataset: FlowPairDataset,
    steps: int = 1000,
    batch_size: int = 8,
    crop_hw=(64, 64),
    max_displacement: int = 20,
    learning_rate: float = 1e-4,
    seed: int = 0,
    mesh=None,
    params=None,
    log_every: int = 100,
):
    """FlowNetC from pairs; the net predicts flow/DIV_FLOW at 1/4 res and the
    pyramid supervises all scales (reference convention)."""
    log = get_logger()
    mesh = mesh or make_mesh()
    model = FlowNetC(max_displacement=max_displacement, return_pyramid=True)
    rng = np.random.default_rng(seed)

    if params is None:
        z = jnp.zeros((1, *crop_hw, 3))
        params = model.init(jax.random.PRNGKey(seed), z, z)

    def loss_fn(pr, batch):
        i1, i2, gt = batch
        _, flows = model.apply(pr, i1, i2)
        return multiscale_epe([f for f in flows], gt / DIV_FLOW)

    tx = optax.adam(learning_rate)
    state = replicate_state(create_train_state(params, tx), mesh)
    step = make_dp_train_step(loss_fn, tx, mesh)

    n_dev = mesh.devices.size
    bs = max(batch_size - batch_size % n_dev, n_dev)
    loss = float("nan")
    for it in range(steps):
        i1, i2, fl = dataset.batch(rng, bs, crop_hw)
        batch = shard_train_batch(
            (jnp.asarray(i1), jnp.asarray(i2), jnp.asarray(fl)), mesh
        )
        state, loss = step(state, batch)
        if log_every and (it + 1) % log_every == 0:
            log.info("flow step %d/%d loss %.4f", it + 1, steps, float(loss))
    return state.params, float(loss)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    ds = FlowPairDataset(args.data)
    params, loss = train_flownet_c(
        ds, steps=args.steps, batch_size=args.batch_size
    )
    if args.out:
        from premvos_tpu.utils.checkpoint import save_params

        save_params(args.out, params)
    print({"final_loss": loss})


if __name__ == "__main__":
    main()
