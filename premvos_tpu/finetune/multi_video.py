"""Video-parallel per-video fine-tuning (SURVEY.md §2.4 host-parallel row).

The reference fine-tunes per video sequentially on one GPU — its dominant
wall-clock cost (~38 s/frame amortized). Videos are independent, so here V
videos fine-tune simultaneously: parameters are STACKED along a leading video
axis, the axis is sharded over the device mesh with shard_map, and each
device vmaps the train step over its local video slice — V independent
optimizations, zero collectives, one jitted step. With V = #chips this
divides fine-tuning wall-clock by the mesh size.

shard_map (not a plain sharded vmap) is load-bearing: vmapping a conv over
stacked kernels lowers to feature_group_count=V, and GSPMD partitioning of
that conv over the video axis requires the LOCAL kernel's output features to
be divisible by the GLOBAL group count — which fails exactly in the
production regime of one video per chip. Inside shard_map the per-device
program sees only its local slice, so no grouped-conv partitioning happens.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from premvos_tpu.config import FinetuneConfig, RefineConfig
from premvos_tpu.data.lucid import lucid_batch
from premvos_tpu.finetune.finetune import make_refine_examples
from premvos_tpu.train.losses import sigmoid_xent


def finetune_refine_videos(
    model,
    params,
    videos: list[tuple[np.ndarray, np.ndarray]],
    mesh,
    refine_cfg: RefineConfig = RefineConfig(),
    ft_cfg: FinetuneConfig = FinetuneConfig(),
    seed: int = 0,
):
    """Fine-tune the refinement net on V videos in parallel.

    Args:
      videos: list of (first_frame [H,W,3] uint8, first_labels [H,W] int).
        Padded to a mesh-size multiple internally (extra slots replicate the
        last video; their results are discarded).

    Returns list of per-video params pytrees (same order as `videos`).
    """
    n_dev = mesh.devices.size
    v_real = len(videos)
    v = -(-v_real // n_dev) * n_dev
    vids = list(videos) + [videos[-1]] * (v - v_real)

    rng = np.random.default_rng(seed)
    bs = max(ft_cfg.batch_size // 2, 2)
    s = refine_cfg.crop_size

    # Per-video augmentation pools (host side).
    pools = []
    for frame, labels in vids:
        imgs, labs = lucid_batch(
            frame, labels, rng, min(ft_cfg.num_augmentations, max(ft_cfg.steps, 32))
        )
        crops, tgts = make_refine_examples(
            imgs, labs, s, refine_cfg.box_margin, rng
        )
        if len(crops) == 0:  # degenerate video: train on zeros, discard
            crops = np.zeros((1, s, s, 4), np.float32)
            tgts = np.zeros((1, s, s), np.float32)
        pools.append((crops, tgts))

    tx = optax.adam(ft_cfg.learning_rate)

    def single_step(p, opt, batch):
        x, y = batch

        def loss_fn(pp):
            return sigmoid_xent(model.apply(pp, x), y)

        loss, g = jax.value_and_grad(loss_fn)(p)
        up, opt = tx.update(g, opt, p)
        return optax.apply_updates(p, up), opt, loss

    from jax import shard_map

    vstep = jax.jit(
        shard_map(
            jax.vmap(single_step),
            mesh=mesh,
            in_specs=(P("data"), P("data"), P("data")),
            out_specs=(P("data"), P("data"), P("data")),
            check_vma=False,
        )
    )

    shard_v = NamedSharding(mesh, P("data"))

    def stack_shard(trees):
        return jax.tree.map(
            lambda *xs: jax.device_put(jnp.stack(xs), shard_v), *trees
        )

    vparams = stack_shard([params] * v)
    vopt = stack_shard([tx.init(params)] * v)

    losses = None
    for _ in range(ft_cfg.steps):
        xs, ys = [], []
        for crops, tgts in pools:
            idx = rng.integers(0, len(crops), size=bs)
            xs.append(crops[idx])
            ys.append(tgts[idx])
        batch = (
            jax.device_put(jnp.asarray(np.stack(xs)), shard_v),
            jax.device_put(jnp.asarray(np.stack(ys)), shard_v),
        )
        vparams, vopt, losses = vstep(vparams, vopt, batch)

    out = []
    for i in range(v_real):
        out.append(jax.tree.map(lambda x: x[i], vparams))
    return out, np.asarray(losses)[:v_real]
