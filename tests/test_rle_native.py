import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

from premvos_tpu.io_compat import rle as np_rle

ROOT = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def native():
    if not (ROOT / "native" / "lib" / "librle.so").exists():
        if shutil.which("g++") is None:
            pytest.skip("no g++ and no prebuilt librle.so")
        subprocess.run(["sh", str(ROOT / "native" / "build.sh")], check=True)
    from premvos_tpu.io_compat import rle_native

    assert rle_native.available()
    return rle_native


def test_native_encode_matches_numpy(native, rng):
    for _ in range(5):
        m = (rng.uniform(0, 1, (61, 47)) > 0.6).astype(np.uint8)
        assert native.encode(m) == np_rle.encode(m)


def test_native_decode_matches_numpy(native, rng):
    m = (rng.uniform(0, 1, (480, 854)) > 0.8).astype(np.uint8)
    r = np_rle.encode(m)
    np.testing.assert_array_equal(native.decode(r), m)


def test_native_adversarial(native):
    for m in [
        np.zeros((5, 5), np.uint8),
        np.ones((5, 5), np.uint8),
        np.eye(7, dtype=np.uint8),
    ]:
        assert native.encode(m) == np_rle.encode(m)
        np.testing.assert_array_equal(native.decode(native.encode(m)), m)


def test_native_iou_matches_numpy(native, rng):
    a = np.zeros((40, 40), np.uint8)
    b = np.zeros((40, 40), np.uint8)
    a[5:25, 5:25] = 1
    b[15:35, 15:35] = 1
    ra, rb = np_rle.encode(a), np_rle.encode(b)
    assert native.iou(ra, rb) == pytest.approx(np_rle.iou(ra, rb), rel=1e-9)
    # random masks
    for _ in range(3):
        a = (rng.uniform(0, 1, (33, 29)) > 0.5).astype(np.uint8)
        b = (rng.uniform(0, 1, (33, 29)) > 0.5).astype(np.uint8)
        ra, rb = np_rle.encode(a), np_rle.encode(b)
        assert native.iou(ra, rb) == pytest.approx(np_rle.iou(ra, rb), rel=1e-9)


def test_native_iou_empty(native):
    z = np_rle.encode(np.zeros((8, 8), np.uint8))
    assert native.iou(z, z) == 0.0
