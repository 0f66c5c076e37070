import numpy as np

from premvos_tpu.data.davis import (
    DavisDataset,
    crop_result,
    make_synthetic_davis,
    save_results,
)
from premvos_tpu.data.lucid import inpaint_background, lucid_batch, lucid_dream
from premvos_tpu.data.palette import load_indexed_png


def test_davis_reader_roundtrip(tmp_path):
    root = make_synthetic_davis(tmp_path / "davis", t=4, hw=(64, 96))
    ds = DavisDataset(root)
    assert ds.sequences == ["seq_a"]
    seq = ds.load_sequence("seq_a", height=64, width=128, max_objects=4)
    assert seq["frames"].shape == (4, 64, 128, 3)
    assert seq["gt_masks"].shape == (4, 64, 128)
    assert seq["num_objects"] == 2
    assert seq["orig_hw"] == (64, 96)
    # padding region is zero
    assert seq["frames"][:, :, 96:].sum() == 0
    # first-frame mask slots match annotation
    assert seq["gt_masks"][0].sum() == 100  # 10×10 square
    lab = crop_result(seq["gt_labels"], seq["orig_hw"])
    assert lab.shape == (4, 64, 96)


def test_davis_reader_warns_on_max_objects_truncation(tmp_path):
    import pytest

    root = make_synthetic_davis(tmp_path / "davis", t=2, hw=(64, 96),
                                num_objects=3)
    ds = DavisDataset(root)
    with pytest.warns(UserWarning, match="max_objects=2.*DROPPING"):
        seq = ds.load_sequence("seq_a", height=64, width=96, max_objects=2)
    assert seq["num_objects"] == 2
    # within the cap: no warning
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        seq = ds.load_sequence("seq_a", height=64, width=96, max_objects=4)
    assert seq["num_objects"] == 3


def test_davis_save_results(tmp_path):
    labels = np.zeros((2, 16, 16), np.uint8)
    labels[:, 2:6, 2:6] = 1
    save_results(tmp_path, "seq_x", labels)
    back = load_indexed_png(tmp_path / "seq_x" / "00000.png")
    np.testing.assert_array_equal(back, labels[0])


def test_lucid_dream_preserves_objects(rng):
    h, w = 64, 64
    img = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    lab = np.zeros((h, w), np.int32)
    lab[20:35, 20:35] = 1
    lab[45:55, 10:20] = 2
    aug_img, aug_lab = lucid_dream(img, lab, rng)
    assert aug_img.shape == img.shape and aug_img.dtype == np.uint8
    assert set(np.unique(aug_lab)) <= {0, 1, 2}
    # objects survive with roughly similar area (affine scale 0.9–1.1)
    for obj in (1, 2):
        a0 = (lab == obj).sum()
        a1 = (aug_lab == obj).sum()
        assert 0.5 * a0 < a1 < 2.0 * a0


def test_lucid_batch_variability(rng):
    img = rng.integers(0, 255, (48, 48, 3)).astype(np.uint8)
    lab = np.zeros((48, 48), np.int32)
    lab[10:30, 10:30] = 1
    imgs, labs = lucid_batch(img, lab, rng, n=4)
    assert imgs.shape == (4, 48, 48, 3)
    # different samples differ
    assert (labs[0] != labs[1]).any() or (imgs[0] != imgs[1]).any()


def test_inpaint_background_removes_foreground(rng):
    img = np.full((32, 32, 3), 100, np.uint8)
    lab = np.zeros((32, 32), np.int32)
    img[10:20, 10:20] = 255
    lab[10:20, 10:20] = 1
    bg = inpaint_background(img, lab)
    assert abs(int(bg[15, 15].mean()) - 100) < 30  # filled from surroundings


def test_synthetic_vos_contrast_floor(tmp_path):
    # Tracked objects must be visible (DAVIS objects are human-annotatable):
    # the generator resamples camouflaged colors until each tracked entity
    # clears a contrast floor against the background along its path.
    import numpy as np

    from premvos_tpu.data.synthetic_vos import (
        EntitySpec,
        _ensure_contrast,
        _rand_tex,
        build_sequence_spec,
        _smooth_background,
    )

    rng = np.random.default_rng(3)
    bg = _smooth_background(rng, 64, 96)
    ents = build_sequence_spec(rng, t=24, hw=(64, 96), n_tracked=2,
                               n_distractors=1)
    # force a camouflaged tracked entity: color == background at its path
    import dataclasses

    y0, x0 = (int(ents[0].positions[0, 0]) % 64, int(ents[0].positions[0, 1]) % 96)
    ents[0] = dataclasses.replace(ents[0], color=bg[y0, x0].astype(np.float32))
    fixed = _ensure_contrast(ents, bg, rng, min_dist=110.0)
    h, w = bg.shape[:2]
    for e in fixed:
        if not e.tracked:
            continue
        ys = np.clip(e.positions[:, 0].astype(int), 0, h - 1)
        xs = np.clip(e.positions[:, 1].astype(int), 0, w - 1)
        d = np.linalg.norm(bg[ys, xs] - e.color[None], axis=-1).min()
        assert d >= 100.0, d
    # distractors stay look-alikes of their twin
    twin, dis = fixed[0], fixed[2]
    assert np.abs(twin.color - dis.color).max() <= 12.5
