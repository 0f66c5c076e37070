"""Opt-in end-metric gate: HELD-OUT tracking on the synthetic VOS benchmark.

Unlike the overfit single-clip demo (test_synthetic_accuracy), this trains
on the benchmark's train split and scores J&F on UNSEEN val sequences with
crossing/occlusion, full disappearance + re-appearance, look-alike
distractors, and scale change — the conditions the merge machinery exists
for (mirrors how the reference's J&F 77.8 was earned on unseen DAVIS val,
SURVEY.md §0/§6). The committed full-run record is
docs/SYNTHETIC_BENCHMARK.json; this wrapper runs the reduced --quick
variant, so it is opt-in:  pytest -m accuracy
"""

import pytest

pytestmark = [pytest.mark.slow, pytest.mark.accuracy]


def test_heldout_tracking_and_ablation(tmp_path):
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from run_synthetic_benchmark import main

    out = tmp_path / "bench.json"
    # --quick steps train less than the committed full run (threshold 0.6
    # there); the random-weights floor is ~0.05, so 0.45 still proves
    # generalizing tracking under occlusion/disappearance/distractors.
    report = main(["--quick", "--threshold", "0.45", "--out", str(out)])
    assert report["passed"], report["held_out"]

    abl = {r["name"]: r["J&F"] for r in report["ablation"]}
    tuned = abl["tuned"]
    # the headline runs at the TUNED operating point; no zeroed term should
    # HELP (beyond noise) ...
    for name in ("no_reid", "no_warp", "no_overlap"):
        assert abl[name] <= tuned + 0.02, (name, abl)
    # ... and at least one merge term must be load-bearing on this data.
    assert min(abl["no_reid"], abl["no_warp"], abl["no_overlap"]) < tuned - 0.02, abl
    # tuned weights must not lose to the reference all-1.0 defaults held-out
    assert tuned >= report["held_out"]["default_weights_JF"] - 0.02

    saved = json.loads(out.read_text())
    assert saved["held_out"]["J&F"] == report["held_out"]["J&F"]
