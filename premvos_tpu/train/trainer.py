"""Data-parallel training step over a device mesh.

The reference has three engines (tensorpack-style trainer, the OnAVOS-family
Engine/Trainer, flownet2's argparse loop — SURVEY.md L2); here one generic
trainer serves every net: a loss closure + optax optimizer + `shard_map`'d
step with an explicit `psum` over the data axis. Parameters are replicated,
batches sharded; under jit the whole step (fwd + bwd + all-reduce + update)
is one XLA program riding ICI.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


def make_dp_train_step(
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    axis: str = "data",
):
    """Build a jitted DP train step.

    loss_fn(params, batch) → scalar loss (per-shard mean). Gradients and the
    loss are `psum`-averaged across the mesh; the optax update runs
    replicated on every chip (identical by construction).

    Returns step(state, batch) → (state, loss); `batch` must be a pytree of
    [B, ...] arrays with B divisible by the mesh size.
    """
    n = mesh.devices.size

    def _step(state: TrainState, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    rep = P()
    shd = P(axis)

    sharded = shard_map(
        _step,
        mesh=mesh,
        in_specs=(rep, shd),
        out_specs=(rep, rep),
        check_vma=False,
    )
    step = jax.jit(sharded)

    def run(state: TrainState, batch):
        return step(state, batch)

    run.mesh = mesh
    run.num_devices = n
    return run


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), state)


def shard_train_batch(batch, mesh: Mesh, axis: str = "data"):
    def put(x):
        return jax.device_put(
            x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))
        )

    return jax.tree.map(put, batch)
