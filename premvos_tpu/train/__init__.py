"""Training: one DP engine, per-net losses and loops (SURVEY.md L2)."""

from premvos_tpu.train.losses import (
    batch_hard_triplet,
    endpoint_error,
    multiscale_epe,
    sigmoid_xent,
    smooth_l1,
    softmax_xent,
)
from premvos_tpu.train.trainer import (
    TrainState,
    create_train_state,
    make_dp_train_step,
    replicate_state,
    shard_train_batch,
)

__all__ = [
    "batch_hard_triplet", "endpoint_error", "multiscale_epe",
    "sigmoid_xent", "smooth_l1", "softmax_xent",
    "TrainState", "create_train_state", "make_dp_train_step",
    "replicate_state", "shard_train_batch",
]
