"""ctypes binding for the native C++ RLE codec (native/rle/rle.cc).

Drop-in faster variants of `io_compat.rle.encode/decode/iou`. Falls back to
the numpy oracle transparently if the shared library hasn't been built
(`native/build.sh`). The environment has no pybind11, so the binding is a
plain C ABI + ctypes (see repo build notes).
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path

import numpy as np

from premvos_tpu.io_compat import rle as _np_rle

_LIB = None


def _find_lib():
    here = Path(__file__).resolve()
    for base in [here.parents[2], Path.cwd()]:
        p = base / "native" / "lib" / "librle.so"
        if p.exists():
            return str(p)
    return os.environ.get("PREMVOS_RLE_LIB")


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = _find_lib()
    if not path:
        return None
    lib = ctypes.CDLL(path)
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.rle_encode_counts.restype = ctypes.c_int
    lib.rle_encode_counts.argtypes = [u8p, ctypes.c_int, ctypes.c_int, i64p]
    lib.rle_decode_mask.restype = ctypes.c_int
    lib.rle_decode_mask.argtypes = [i64p, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p]
    lib.rle_counts_to_string.restype = ctypes.c_int
    lib.rle_counts_to_string.argtypes = [i64p, ctypes.c_int, ctypes.c_char_p]
    lib.rle_string_to_counts.restype = ctypes.c_int
    lib.rle_string_to_counts.argtypes = [ctypes.c_char_p, ctypes.c_int, i64p]
    lib.rle_iou.restype = ctypes.c_double
    lib.rle_iou.argtypes = [i64p, ctypes.c_int, i64p, ctypes.c_int]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def encode(mask: np.ndarray) -> dict:
    lib = _load()
    if lib is None:
        return _np_rle.encode(mask)
    m = np.ascontiguousarray(mask, np.uint8)
    h, w = m.shape
    counts = np.empty(h * w + 1, np.int64)
    n = lib.rle_encode_counts(m, h, w, counts)
    buf = ctypes.create_string_buffer(13 * n)
    slen = lib.rle_counts_to_string(counts[:n].copy(), n, buf)
    return {"size": [int(h), int(w)], "counts": buf.raw[:slen].decode("ascii")}


def decode(rle: dict) -> np.ndarray:
    lib = _load()
    if lib is None:
        return _np_rle.decode(rle)
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        s = counts.encode("ascii") if isinstance(counts, str) else counts
        out = np.empty(max(len(s), 1), np.int64)
        n = lib.rle_string_to_counts(s, len(s), out)
        if n < 0:
            raise ValueError("truncated RLE counts string")
        counts = out[:n]
    counts = np.ascontiguousarray(counts, np.int64)
    mask = np.empty((h, w), np.uint8)
    rc = lib.rle_decode_mask(counts, len(counts), h, w, mask)
    if rc != 0:
        raise ValueError("RLE counts do not sum to H*W")
    return mask


def iou(a: dict, b: dict) -> float:
    lib = _load()
    if lib is None:
        return _np_rle.iou(a, b)

    def _counts(r):
        c = r["counts"]
        if isinstance(c, (str, bytes)):
            s = c.encode("ascii") if isinstance(c, str) else c
            out = np.empty(max(len(s), 1), np.int64)
            n = lib.rle_string_to_counts(s, len(s), out)
            return np.ascontiguousarray(out[:n])
        return np.ascontiguousarray(c, np.int64)

    ca, cb = _counts(a), _counts(b)
    return float(lib.rle_iou(ca, len(ca), cb, len(cb)))
