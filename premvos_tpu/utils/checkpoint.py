"""Checkpointing via orbax (SURVEY.md C17).

Reference: TF `Saver` checkpoints per net (C1/C2/C4) + `torch.save` (C3);
pipeline-level "resume" is stage outputs on disk. Here: one orbax checkpoint
holds the whole four-net parameter bundle; per-video fine-tuned variants save
under `<dir>/finetuned/<video>`. Sequence-level rerun is the resume
granularity (a sequence is seconds of compute once jitted).
"""

from __future__ import annotations

from pathlib import Path

import jax
import orbax.checkpoint as ocp


def save_params(path, params) -> None:
    path = Path(path).resolve()
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, params, force=True)
    ckpt.wait_until_finished()


def load_params(path, like=None):
    path = Path(path).resolve()
    ckpt = ocp.StandardCheckpointer()
    if like is not None:
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
        return ckpt.restore(path, target)
    return ckpt.restore(path)
