"""premvos_tpu: a TPU-native rebuild of PReMVOS (JonathonLuiten/PReMVOS).

PReMVOS is a five-stage video-object-segmentation pipeline: Mask R-CNN-style
proposal generation, DeepLabv3+-style proposal refinement, FlowNet2-style
optical flow with mask warping, triplet-ReID embeddings, and a greedy
merge/track algorithm. The reference glues four research codebases (three TF
graph-mode, one PyTorch+CUDA) through the filesystem; this package is a single
JAX/XLA/Pallas framework where every stage is a pure function over pytrees and
the whole pipeline runs as one jitted scan over frames with all state resident
in HBM.

Layout:
  ops/       TPU kernels (Pallas) + jnp reference implementations
  models/    flax.linen networks: ResNet-FPN Mask R-CNN, DeepLabv3+,
             FlowNet2 (C/S/SD/Fusion), triplet-ReID
  stages/    the five pipeline stages as pure functions
  pipeline/  scan-over-frames driver, HBM state, device meshes
  parallel/  mesh + sharding helpers
  data/      DAVIS readers, palette PNG, lucid-dream augmentation
  io_compat/ reference-parity codecs: COCO RLE, proposals JSON, .flo
  finetune/  per-video fine-tuning
  train/     losses and training loops
  eval/      DAVIS J&F measures (in-repo)
"""

__version__ = "0.1.0"
