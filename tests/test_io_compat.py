import numpy as np
import pytest

from premvos_tpu.data.palette import davis_palette, load_indexed_png, save_indexed_png
from premvos_tpu.io_compat import rle
from premvos_tpu.io_compat.flo import read_flo, write_flo
from premvos_tpu.io_compat.proposals_json import (
    FrameProposals,
    load_proposals,
    save_proposals,
)


# ---------------------------------------------------------------- RLE codec
def adversarial_masks():
    yield np.zeros((7, 5), np.uint8)
    yield np.ones((7, 5), np.uint8)
    m = np.zeros((6, 6), np.uint8)
    m[::2, ::2] = 1  # checkerboard-ish: many 1-runs
    yield m
    m = np.zeros((480, 854), np.uint8)
    m[100:300, 200:600] = 1  # long runs > 2^15 exercise multi-char + deltas
    yield m
    m = np.zeros((1, 1), np.uint8)
    yield m
    yield np.ones((1, 1), np.uint8)


def test_rle_roundtrip_adversarial():
    for m in adversarial_masks():
        r = rle.encode(m)
        assert isinstance(r["counts"], str)
        np.testing.assert_array_equal(rle.decode(r), m)


def test_rle_roundtrip_random(rng):
    for _ in range(5):
        m = (rng.uniform(0, 1, (37, 53)) > 0.7).astype(np.uint8)
        np.testing.assert_array_equal(rle.decode(rle.encode(m)), m)


def test_rle_counts_are_column_major():
    # 2×2 mask with only top-right set: column-major flat = [0, 0, 1, 0]
    m = np.array([[0, 1], [0, 0]], np.uint8)
    counts = rle.mask_to_counts(m)
    np.testing.assert_array_equal(counts, [2, 1, 1])


def test_rle_delta_encoding_known_vector():
    # First two counts raw, later counts delta vs two back; values < 16
    # encode as single chars (c + 48).
    counts = [3, 2]
    s = rle.encode_counts(counts)
    assert s == chr(3 + 48) + chr(2 + 48)
    np.testing.assert_array_equal(rle.decode_counts(s), counts)


def test_rle_negative_delta_roundtrip():
    # Deltas can be negative → sign-extension path.
    counts = [100, 5, 100, 3, 50]  # counts[3]-counts[1]=-2, counts[4]-counts[2]=-50
    s = rle.encode_counts(counts)
    np.testing.assert_array_equal(rle.decode_counts(s), counts)


def test_rle_area_and_bbox():
    m = np.zeros((20, 30), np.uint8)
    m[5:15, 10:25] = 1
    r = rle.encode(m)
    assert rle.area(r) == 10 * 15
    np.testing.assert_array_equal(rle.to_bbox(r), [10, 5, 15, 10])


def test_rle_iou():
    a = np.zeros((10, 10), np.uint8)
    b = np.zeros((10, 10), np.uint8)
    a[:5] = 1
    b[3:8] = 1
    got = rle.iou(rle.encode(a), rle.encode(b))
    assert got == pytest.approx(20 / 80)


def test_rle_uncompressed_counts_accepted():
    m = np.zeros((4, 4), np.uint8)
    m[1:3, 1:3] = 1
    counts = rle.mask_to_counts(m).tolist()
    np.testing.assert_array_equal(
        rle.decode({"size": [4, 4], "counts": counts}), m
    )


# ---------------------------------------------------------------- .flo
def test_flo_roundtrip(tmp_path, rng):
    flow = rng.standard_normal((17, 23, 2)).astype(np.float32) * 10
    p = tmp_path / "x.flo"
    write_flo(p, flow)
    got = read_flo(p)
    np.testing.assert_array_equal(got, flow)


def test_flo_bad_magic(tmp_path):
    p = tmp_path / "bad.flo"
    p.write_bytes(b"\x00" * 16)
    with pytest.raises(ValueError):
        read_flo(p)


# ---------------------------------------------------------------- palette PNG
def test_palette_first_entries():
    pal = davis_palette()
    np.testing.assert_array_equal(pal[0], [0, 0, 0])
    np.testing.assert_array_equal(pal[1], [128, 0, 0])
    np.testing.assert_array_equal(pal[2], [0, 128, 0])
    np.testing.assert_array_equal(pal[3], [128, 128, 0])


def test_indexed_png_roundtrip(tmp_path, rng):
    labels = rng.integers(0, 5, (24, 32)).astype(np.uint8)
    p = tmp_path / "m.png"
    save_indexed_png(p, labels)
    np.testing.assert_array_equal(load_indexed_png(p), labels)


# ---------------------------------------------------------------- proposals JSON
def test_proposals_roundtrip(tmp_path, rng):
    n, h, w = 4, 16, 20
    boxes = np.array(
        [[1, 2, 10, 12], [0, 0, 5, 5], [3, 3, 19, 15], [2, 2, 4, 4]], np.float32
    )
    masks = (rng.uniform(0, 1, (8, h, w)) > 0.6).astype(np.uint8)[:8]
    props = FrameProposals(
        boxes=np.pad(boxes, ((0, 4), (0, 0))),
        scores=np.pad(rng.uniform(0, 1, n).astype(np.float32), (0, 4)),
        masks=masks,
        valid=np.array([True] * n + [False] * 4),
        embeddings=np.pad(
            rng.standard_normal((n, 8)).astype(np.float32), ((0, 4), (0, 0))
        ),
    )
    p = tmp_path / "frame_00000.json"
    save_proposals(p, props)
    got = load_proposals(p, max_proposals=8, image_size=(h, w))
    assert got.count == n
    np.testing.assert_allclose(got.boxes[:n], boxes, rtol=1e-6)
    np.testing.assert_allclose(got.scores[:n], props.scores[:n], rtol=1e-6)
    np.testing.assert_array_equal(got.masks[:n], masks[:n])
    np.testing.assert_allclose(got.embeddings[:n], props.embeddings[:n], rtol=1e-6)
    assert not got.valid[n:].any()


def test_proposals_truncates_to_max(tmp_path, rng):
    props = FrameProposals(
        boxes=rng.uniform(0, 10, (6, 4)).astype(np.float32),
        scores=rng.uniform(0, 1, 6).astype(np.float32),
        masks=np.ones((6, 8, 8), np.uint8),
        valid=np.ones(6, bool),
    )
    p = tmp_path / "f.json"
    save_proposals(p, props)
    got = load_proposals(p, max_proposals=3, image_size=(8, 8))
    assert got.count == 3
