import pytest
import numpy as np

from premvos_tpu.config import RefineConfig
from premvos_tpu.data.davis import DavisDataset, make_synthetic_davis
from premvos_tpu.parallel.mesh import make_mesh
from premvos_tpu.train.train_refine import train_refine


pytestmark = pytest.mark.slow


def test_train_refine_engine(tmp_path):
    root = make_synthetic_davis(tmp_path / "davis", t=3, hw=(64, 64))
    ds = DavisDataset(root)
    cfg = RefineConfig(crop_size=33, backbone_depth=26, box_margin=6.0)
    mesh = make_mesh(2)
    params, loss = train_refine(
        ds, cfg, steps=3, batch_size=2, mesh=mesh, image_hw=(64, 64),
        log_every=0,
    )
    assert np.isfinite(loss)
