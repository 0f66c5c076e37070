"""Probe: do the floor/decay/sigma knobs fix the identity-swap losses?"""
import os, sys, json, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/scripts")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/premvos_jax_cache")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from run_synthetic_benchmark import bench_config, oracle_jf
from premvos_tpu.data.davis import DavisDataset
from premvos_tpu.pipeline.runner import build_models, init_params
from premvos_tpu.utils.checkpoint import load_params
from premvos_tpu.eval.harness import DEFAULT_WEIGHTS, evaluate_weights, precompute_split

cfg = bench_config(canvas=(128, 192))
models = build_models(cfg)
params = dict(init_params(models, cfg, jax.random.PRNGKey(0)))
params = load_params("/tmp/vosbench128/params_v2", like=params)
ds_val = DavisDataset("/tmp/vosbench128/data", split="val")
t0 = time.time()
pre = precompute_split(models, params, cfg, ds_val, verbose=False)
print(f"[precompute] {time.time()-t0:.0f}s", flush=True)

# (w_obj, w_reid, w_warp, w_overlap, reid_sigma, floor, warp_decay, reid_ema)
cands = {
    "defaults":            [1,1,1,1, 1.0, 0.0, 1.0, 0.0],
    "floor0.5":            [1,1,1,1, 1.0, 0.5, 1.0, 0.0],
    "floor1.0":            [1,1,1,1, 1.0, 1.0, 1.0, 0.0],
    "decay0.6":            [1,1,1,1, 1.0, 0.0, 0.6, 0.0],
    "floor1+decay0.6":     [1,1,1,1, 1.0, 1.0, 0.6, 0.0],
    "floor1+decay0.3":     [1,1,1,1, 1.0, 1.0, 0.3, 0.0],
    "f1+d0.6+sig0.4":      [1,1,1,1, 0.4, 1.0, 0.6, 0.0],
    "f1+d0.6+ov0.3":       [1,1,1,0.3, 1.0, 1.0, 0.6, 0.0],
    "f1+d0.6+reid2":       [1,2,1,1, 1.0, 1.0, 0.6, 0.0],
    "f1+d0.6+ov0.3+reid2": [1,2,1,0.3, 1.0, 1.0, 0.6, 0.0],
    "f1.5+d0.4+ov0.3+reid2":[1,2,1,0.3, 1.0, 1.5, 0.4, 0.0],
}
out = {}
for name, w in cands.items():
    jf, per = evaluate_weights(pre, np.asarray(w, np.float32), 1)
    out[name] = round(float(jf), 4)
    print(f"{name:24s} J&F = {jf:.4f}", flush=True)
print(json.dumps({"oracle": round(oracle_jf(pre), 4), "probe": out}))
