"""Model zoo: the four PReMVOS networks, flax.linen, NHWC, TPU-first."""

from premvos_tpu.models.deeplab import DeepLabV3Plus
from premvos_tpu.models.flownet import (
    FlowNet2,
    FlowNetC,
    FlowNetFusion,
    FlowNetS,
    FlowNetSD,
)
from premvos_tpu.models.maskrcnn import MaskRCNN
from premvos_tpu.models.reid import ReIDNet
from premvos_tpu.models.resnet import ResNet

__all__ = [
    "DeepLabV3Plus",
    "FlowNet2",
    "FlowNetC",
    "FlowNetFusion",
    "FlowNetS",
    "FlowNetSD",
    "MaskRCNN",
    "ReIDNet",
    "ResNet",
]
