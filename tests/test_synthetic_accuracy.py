"""Opt-in end-metric gate: the pipeline learns and tracks (J&F).

Mirrors the reference's only form of validation (end-metric J&F via the
official evaluator — SURVEY.md §4). The full demonstration lives in
scripts/train_synthetic_demo.py; its committed record is
docs/SYNTHETIC_ACCURACY.json (J&F 0.854 on TPU, 2026-08-17). This wrapper
runs the reduced --quick variant with a modest floor — tens of minutes of
training, so it is opt-in:  pytest -m accuracy
"""

import pytest

pytestmark = [pytest.mark.slow, pytest.mark.accuracy]


def test_quick_training_beats_random_floor(tmp_path):
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from train_synthetic_demo import main

    out = tmp_path / "acc.json"
    # --quick steps; random-weights floor is ~0.0 — 0.25 proves learning.
    main(["--quick", "--threshold", "0.25", "--out", str(out)])
    report = json.loads(out.read_text())
    assert report["passed"], report
