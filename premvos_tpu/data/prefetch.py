"""Host→device input prefetch (SURVEY.md §2.5).

The reference's stages re-read everything from disk between processes; here
the only host↔device traffic is frame upload, and this module overlaps the
host work (JPEG decode, padding) and the H2D copy of sequence t+1 with the
device compute of sequence t — a small thread pool ahead-loads sequences and
`jax.device_put`s the arrays so the accelerator never waits on PIL.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp


def prefetch_sequences(
    dataset,
    names,
    height: int,
    width: int,
    max_objects: int,
    max_frames=None,
    depth: int = 2,
):
    """Yield (name, seq_dict) with `frames`/`gt_masks`/`intro_frames` already
    on device, loading `depth` sequences ahead."""

    def load(name):
        seq = dataset.load_sequence(name, height, width, max_objects, max_frames)
        seq = dict(seq)
        seq["frames"] = jax.device_put(jnp.asarray(seq["frames"]))
        seq["gt_masks"] = jax.device_put(jnp.asarray(seq["gt_masks"]))
        seq["intro_frames"] = jax.device_put(jnp.asarray(seq["intro_frames"]))
        return seq

    names = list(names)
    with ThreadPoolExecutor(max_workers=depth) as pool:
        futures = {}
        for name in names[:depth]:
            futures[name] = pool.submit(load, name)
        for i, name in enumerate(names):
            nxt = i + depth
            if nxt < len(names):
                futures[names[nxt]] = pool.submit(load, names[nxt])
            yield name, futures.pop(name).result()
