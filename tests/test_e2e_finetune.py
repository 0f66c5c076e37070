"""CLI --finetune path: per-video fine-tune of BOTH nets, then track."""

import pytest
import dataclasses

from premvos_tpu.config import FinetuneConfig, save_config
from premvos_tpu.data.davis import make_synthetic_davis


pytestmark = pytest.mark.slow


def test_run_davis_with_finetune(tmp_path):
    from premvos_tpu.pipeline import run_davis
    from tests.test_pipeline import TINY

    cfg = dataclasses.replace(
        TINY,
        finetune=FinetuneConfig(
            num_augmentations=4, steps=2, batch_size=2, learning_rate=1e-4
        ),
    )
    cfg_path = tmp_path / "tiny_ft.json"
    save_config(cfg_path, cfg)

    root = make_synthetic_davis(tmp_path / "davis", t=3, hw=(64, 64))
    out = tmp_path / "results"
    summary = run_davis.main(
        [
            "--davis_root", str(root),
            "--output", str(out),
            "--config", str(cfg_path),
            "--finetune",
        ]
    )
    assert summary["frames"] == 2
    assert (out / "seq_a" / "00002.png").exists()
