import numpy as np
import pytest

from premvos_tpu.config import ReIDConfig
from premvos_tpu.data.crops import InstanceCropDataset, make_synthetic_coco
from premvos_tpu.data.flow_pairs import FlowPairDataset, make_synthetic_chairs
from premvos_tpu.parallel.mesh import make_mesh


pytestmark = pytest.mark.slow


def test_instance_crop_dataset(tmp_path, rng):
    images, ann = make_synthetic_coco(tmp_path, num_images=3, per_image=2)
    ds = InstanceCropDataset(images, ann, crop_size=32)
    assert len(ds) == 6
    crop = ds.load_crop(0, rng)
    assert crop.shape == (32, 32, 3)
    mask = ds.instance_mask(0)
    assert mask is not None and mask.sum() > 0
    crops, ids = ds.pk_batch(rng, p=3, k=2)
    assert crops.shape == (6, 32, 32, 3)
    np.testing.assert_array_equal(np.unique(ids), [0, 1, 2])


def test_flow_pair_dataset(tmp_path, rng):
    root = make_synthetic_chairs(tmp_path / "chairs", n=3, hw=(32, 48))
    ds = FlowPairDataset(root)
    assert len(ds) == 3
    i1, i2, fl = ds.load(0)
    assert i1.shape == (32, 48, 3) and fl.shape == (32, 48, 2)
    # ground truth is consistent: img1(x) == img2(x + flow) away from wrap
    dx, dy = int(fl[0, 0, 0]), int(fl[0, 0, 1])
    np.testing.assert_array_equal(
        i1[8:24, 8:40], i2[8 + dy : 24 + dy, 8 + dx : 40 + dx]
    )
    b1, b2, bf = ds.batch(rng, 4, crop_hw=(16, 16))
    assert b1.shape == (4, 16, 16, 3) and bf.shape == (4, 16, 16, 2)


def test_train_reid_engine(tmp_path):
    from premvos_tpu.train.train_reid import train_reid

    images, ann = make_synthetic_coco(tmp_path, num_images=3, per_image=2)
    ds = InstanceCropDataset(images, ann, crop_size=32)
    cfg = ReIDConfig(backbone_depth=26, embedding_dim=8, crop_size=32)
    mesh = make_mesh(2)
    params, loss = train_reid(
        ds, cfg, steps=3, p=2, k=2, mesh=mesh, log_every=0
    )
    assert np.isfinite(loss)


def test_train_flow_engine(tmp_path):
    from premvos_tpu.train.train_flow import train_flownet_c

    root = make_synthetic_chairs(tmp_path / "chairs", n=4, hw=(64, 64))
    ds = FlowPairDataset(root)
    mesh = make_mesh(2)
    params, loss = train_flownet_c(
        ds, steps=3, batch_size=2, crop_hw=(64, 64), max_displacement=4,
        mesh=mesh, log_every=0,
    )
    assert np.isfinite(loss)
