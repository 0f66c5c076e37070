import jax
import jax.numpy as jnp
import numpy as np

from premvos_tpu.models.flownet import FlowNet2
from premvos_tpu.stages.flow import run_flow_pairs


def test_run_flow_pairs_shapes_and_resize(rng):
    model = FlowNet2(variant="flownetc", max_displacement=4)
    frames = jnp.array(rng.uniform(0, 1, (3, 48, 80, 3)), jnp.float32)
    z = jnp.zeros((1, 64, 64, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), z, z)
    flow = run_flow_pairs(model, params, frames, infer_hw=(64, 64))
    assert flow.shape == (2, 48, 80, 2)
    assert bool(jnp.isfinite(flow).all())


def test_davis_reader_first_frame_only_annotation(tmp_path):
    """YouTube-VOS-style: only frame 0 annotated; tracking must still init."""
    from premvos_tpu.data.davis import DavisDataset, make_synthetic_davis

    root = make_synthetic_davis(tmp_path / "d", t=3, hw=(32, 48))
    # Remove all but the first annotation.
    ann = sorted((root / "Annotations" / "480p" / "seq_a").glob("*.png"))
    for p in ann[1:]:
        p.unlink()
    ds = DavisDataset(root)
    seq = ds.load_sequence("seq_a", 32, 48, max_objects=4)
    assert seq["frames"].shape[0] == 3
    assert seq["gt_labels"].shape[0] == 1  # only frame 0
    assert seq["num_objects"] == 2
