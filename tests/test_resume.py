"""Sequence-level resume: completed sequences are skipped on rerun."""

import pytest
from premvos_tpu.data.davis import make_synthetic_davis
from tests.test_e2e import tiny_cfg_path  # noqa: F401 (fixture)


pytestmark = pytest.mark.slow


def test_run_davis_resume(tmp_path, tiny_cfg_path):
    from premvos_tpu.pipeline import run_davis

    root = make_synthetic_davis(tmp_path / "davis", t=3, hw=(64, 64))
    out = tmp_path / "results"
    args = [
        "--davis_root", str(root),
        "--output", str(out),
        "--config", str(tiny_cfg_path),
        "--resume",
    ]
    s1 = run_davis.main(args)
    assert s1["frames"] == 2
    # Second run skips everything.
    s2 = run_davis.main(args)
    assert s2["frames"] == 0
