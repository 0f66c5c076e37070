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


def run_sequences_sharded(
    models, params, cfg, frames, gt_masks, num_objects, mesh, axis="data"
):
    """Track a sharded batch of sequences: frames [B, T, H, W, 3],
    gt_masks [B, K, H, W], num_objects [B]. mesh size must divide B.

    Parameters are replicated; the batch axis is sharded via `shard_map`;
    each chip runs its local sequences UNBATCHED through the fused scan,
    looping with `lax.map` when it owns more than one. No collectives on the
    hot path (sequences are embarrassingly parallel); shard_map (rather than
    vmap + sharding propagation) keeps the per-chip program identical to the
    single-sequence one — a whole-pipeline vmap measured ~9× slower to
    compile for zero runtime benefit.
    """
    from jax import shard_map

    params = replicate(params, mesh)
    frames, gt_masks, num_objects = shard_batch(
        (frames, gt_masks, jnp.asarray(num_objects)), mesh, axis
    )
    b = frames.shape[0]
    n_shards = mesh.shape[axis]
    assert b % n_shards == 0, (b, n_shards)
    b_local = b // n_shards

    def spec(x):
        return P(axis, *([None] * (x.ndim - 1)))

    local_fn = shard_map(
        lambda p, f, g, n: _run_local(models, p, cfg, f, g, n, b_local),
        mesh=mesh,
        in_specs=(P(), spec(frames), spec(gt_masks), P(axis)),
        out_specs=spec(jnp.zeros((b,) + frames.shape[1:4])),
        check_vma=False,
    )
    return jax.jit(local_fn)(params, frames, gt_masks, num_objects)


def _run_local(models, params, cfg, frames, gt_masks, num_objects, b_local):
    from premvos_tpu.pipeline.runner import run_sequence

    if b_local == 1:
        return run_sequence(
            models, params, cfg, frames[0], gt_masks[0], num_objects[0]
        )[None]
    return jax.lax.map(
        lambda xs: run_sequence(models, params, cfg, *xs),
        (frames, gt_masks, num_objects),
    )
