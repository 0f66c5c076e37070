"""Staged (file-passing) mode: the reference's five-stage contract 1:1.

Runs all five stage commands over a synthetic DAVIS tree and checks the
on-disk artifacts at each boundary (JSON schema, .flo, palette PNGs).
"""

import json

import numpy as np
import pytest

from premvos_tpu.data.davis import make_synthetic_davis
from premvos_tpu.io_compat.flo import read_flo
from premvos_tpu.data.palette import load_indexed_png
from tests.test_e2e import tiny_cfg_path  # noqa: F401


pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def staged_run(tmp_path_factory, tiny_cfg_path):  # noqa: F811
    from premvos_tpu.pipeline import run_stages

    base = tmp_path_factory.mktemp("staged")
    root = make_synthetic_davis(base / "davis", t=3, hw=(64, 64))
    work = base / "work"
    common = [
        "--davis_root", str(root), "--seq", "seq_a",
        "--work", str(work), "--config", str(tiny_cfg_path),
    ]
    for stage in ("proposals", "refine", "flow", "reid", "merge"):
        run_stages.main([stage, *common])
    return work


def test_proposals_json_contract(staged_run):
    files = sorted((staged_run / "proposals" / "seq_a").glob("*.json"))
    assert len(files) == 3
    with open(files[0]) as f:
        props = json.load(f)
    for d in props:
        assert set(d) >= {"bbox", "score", "segmentation", "ReID"}
        assert d["segmentation"]["size"] == [64, 64]
        assert isinstance(d["segmentation"]["counts"], str)


def test_flo_files(staged_run):
    files = sorted((staged_run / "flow" / "seq_a").glob("*.flo"))
    assert [f.name for f in files] == ["00001.flo", "00002.flo"]
    fl = read_flo(files[0])
    assert fl.shape == (64, 64, 2)
    assert np.isfinite(fl).all()


def test_merge_pngs(staged_run):
    pngs = sorted((staged_run / "results" / "seq_a").glob("*.png"))
    assert len(pngs) == 3
    lab = load_indexed_png(pngs[0])
    assert lab.shape == (64, 64)
    # frame 0 equals the GT annotation
    assert set(np.unique(lab)) <= {0, 1, 2}
    assert (lab > 0).sum() == 200  # two 10×10 squares
