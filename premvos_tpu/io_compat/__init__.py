"""Reference-parity codecs: COCO RLE, proposals JSON, .flo, converters."""

from premvos_tpu.io_compat import rle, rle_native
from premvos_tpu.io_compat.flo import read_flo, write_flo
from premvos_tpu.io_compat.proposals_json import (
    FrameProposals,
    load_proposals,
    save_proposals,
)

__all__ = [
    "rle", "rle_native", "read_flo", "write_flo",
    "FrameProposals", "load_proposals", "save_proposals",
]
