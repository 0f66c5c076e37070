import numpy as np
import pytest

from premvos_tpu.io_compat import rle


def test_truncated_counts_string_raises():
    # 'abc'-style garbage where the last char claims continuation.
    with pytest.raises(ValueError):
        rle.decode({"size": [10, 10], "counts": "abc"})


def test_counts_sum_mismatch_raises():
    m = np.ones((4, 4), np.uint8)
    r = rle.encode(m)
    with pytest.raises(ValueError):
        rle.decode({"size": [8, 8], "counts": r["counts"]})
