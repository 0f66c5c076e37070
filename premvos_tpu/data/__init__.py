"""Data layer: DAVIS/YT-VOS, crops, flow pairs, augmentation (SURVEY C18)."""

from premvos_tpu.data.davis import DavisDataset, make_synthetic_davis
from premvos_tpu.data.lucid import lucid_batch, lucid_dream
from premvos_tpu.data.palette import (
    davis_palette,
    load_indexed_png,
    save_indexed_png,
)
from premvos_tpu.data.preprocess import normalize, pad_to, to_unit

__all__ = [
    "DavisDataset", "make_synthetic_davis", "lucid_batch", "lucid_dream",
    "davis_palette", "load_indexed_png", "save_indexed_png",
    "normalize", "pad_to", "to_unit",
]
