import numpy as np

from premvos_tpu.data.davis import DavisDataset, make_synthetic_davis
from premvos_tpu.data.prefetch import prefetch_sequences


def test_prefetch_yields_all_sequences_in_order(tmp_path):
    root = make_synthetic_davis(
        tmp_path / "davis", sequences=("a", "b", "c"), t=2, hw=(48, 64)
    )
    ds = DavisDataset(root)
    out = list(prefetch_sequences(ds, ds.sequences, 48, 64, 4, depth=2))
    assert [n for n, _ in out] == ["a", "b", "c"]
    for _, seq in out:
        assert seq["frames"].shape == (2, 48, 64, 3)
        assert seq["num_objects"] == 2
        assert np.asarray(seq["gt_masks"]).sum() > 0
