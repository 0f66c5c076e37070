"""TPU kernels and their jnp reference implementations.

Each op that is native C++/CUDA in the reference gets (a) a pure-jnp reference
implementation used for parity tests and CPU execution, and (b) a Pallas TPU
kernel for the hot path. Reference native ops (SURVEY.md §2.2):

  correlation  — flownet2 correlation_package (CUDA cost volume)
  resample2d   — flownet2 resample2d_package (CUDA bilinear warp)
  channelnorm  — flownet2 channelnorm_package (CUDA per-pixel L2 norm)
  roi_align    — tf.image.crop_and_resize inside the Mask R-CNN graph
  nms          — tf.image.non_max_suppression in RPN + detection filtering
"""

from premvos_tpu.ops.boxes import (
    box_area,
    box_iou,
    clip_boxes,
    decode_boxes,
    encode_boxes,
)
from premvos_tpu.ops.channelnorm import channelnorm
from premvos_tpu.ops.correlation import correlation, correlation_reference
from premvos_tpu.ops.masks import mask_iou, paste_mask
from premvos_tpu.ops.nms import nms, nms_reference
from premvos_tpu.ops.resample2d import resample2d, resample2d_block
from premvos_tpu.ops.roi_align import roi_align, roi_align_reference

__all__ = [
    "box_area",
    "box_iou",
    "clip_boxes",
    "decode_boxes",
    "encode_boxes",
    "channelnorm",
    "correlation",
    "correlation_reference",
    "mask_iou",
    "paste_mask",
    "nms",
    "nms_reference",
    "resample2d",
    "resample2d_block",
    "roi_align",
    "roi_align_reference",
]
