import pytest
import numpy as np

from premvos_tpu.data.davis import DavisDataset, make_synthetic_davis
from premvos_tpu.parallel.mesh import make_mesh
from premvos_tpu.train.train_maskrcnn import train_maskrcnn
from tests.test_maskrcnn import TINY


pytestmark = pytest.mark.slow


def test_train_maskrcnn_engine(tmp_path):
    root = make_synthetic_davis(tmp_path / "davis", t=3, hw=(64, 64))
    ds = DavisDataset(root)
    mesh = make_mesh(2)
    params, loss = train_maskrcnn(
        ds, TINY, image_hw=(64, 64), max_objects=2, steps=2, batch_size=2,
        mesh=mesh, log_every=0,
    )
    assert np.isfinite(loss)
