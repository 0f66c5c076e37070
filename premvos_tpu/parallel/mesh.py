"""Device meshes and sequence-parallel execution.

The reference is single-node/single-GPU with filesystem handoffs; its only
"distributed backend" is the disk (SURVEY.md §2.5). The TPU-native scale-out
axis for VOS is the *sequence*: DAVIS sequences are embarrassingly parallel,
so a batch of sequences is sharded across chips over a 1-D `data` mesh and
each chip runs the fused scan locally — no collectives on the hot path;
XLA inserts the (trivial) all-gather of results at the jit boundary.

Per-video fine-tuning (SURVEY.md §2.4 "host parallelism") shards the same
way: independent videos → independent fine-tune steps per chip
(premvos_tpu.finetune).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Place a pytree of [B, ...] arrays with B sharded over the mesh."""

    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (parameters) onto every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def run_sequences_sharded(models, params, cfg, frames, gt_masks, num_objects, mesh):
    """Track a sharded batch of sequences: frames [B, T, H, W, 3],
    gt_masks [B, K, H, W], num_objects [B]. B must divide the mesh size.

    Parameters are replicated; the batch axis is sharded; each chip scans its
    sequences with the fused pipeline. Compiled once via jit with shardings
    propagated from the inputs.
    """
    from premvos_tpu.pipeline.runner import run_sequence

    params = replicate(params, mesh)
    frames, gt_masks, num_objects = shard_batch(
        (frames, gt_masks, jnp.asarray(num_objects)), mesh
    )

    fn = jax.jit(
        jax.vmap(
            lambda f, g, n: run_sequence(models, params, cfg, f, g, n),
            in_axes=(0, 0, 0),
        )
    )
    return fn(frames, gt_masks, num_objects)
