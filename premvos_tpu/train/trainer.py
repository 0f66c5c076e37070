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


def make_pool_train_step(
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    pool,
    batch_size: int,
    axis: str = "data",
    batch_transform: Callable | None = None,
):
    """DP train step that samples batches from a DEVICE-RESIDENT pool.

    Per-video fine-tuning uploads ~60 MB/step through this platform's host
    relay when batches stream from the host (measured 13.5 s/step); here
    the augmentation pool is uploaded ONCE and every step gathers its batch
    on device from a jitted PRNG keyed on state.step — zero host→device
    traffic inside the loop, and the whole loop pipelines asynchronously.

    Returns (run, pool_on_device): call `state, loss = run(state, pool_d,
    base_key)` per step (pool_d is already device-resident; passing it as an
    argument instead of a closure keeps it out of the compiled constant pool).
    """
    n = mesh.devices.size
    bs = max(batch_size - batch_size % n, n)
    pool = jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x), NamedSharding(mesh, P())),
        pool,
    )
    pool_n = jax.tree.leaves(pool)[0].shape[0]

    def _step(state: TrainState, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    inner = shard_map(
        _step,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @jax.jit
    def run(state: TrainState, pool_d, base_key):
        key = jax.random.fold_in(base_key, state.step)
        idx = jax.random.randint(key, (bs,), 0, pool_n)
        batch = jax.tree.map(lambda x: jnp.take(x, idx, axis=0), pool_d)
        if batch_transform is not None:
            # Per-step hook (runs on device, jitted): lets callers re-salt
            # per-item augmentation seeds each step so a resampled pool item
            # is not augmented identically for the whole run.
            batch = batch_transform(batch, jax.random.fold_in(key, 1))
        return inner(state, batch)

    run.mesh = mesh
    run.num_devices = n
    run.batch_size = bs
    return run, pool


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), state)


def shard_train_batch(batch, mesh: Mesh, axis: str = "data"):
    def put(x):
        return jax.device_put(
            x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))
        )

    return jax.tree.map(put, batch)
