"""A/B: raw vs l2-normalized triplet embeddings on the benchmark world."""
import os, sys, time, json, dataclasses
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/scripts")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/premvos_jax_cache")
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from run_synthetic_benchmark import bench_config
from premvos_tpu.data.davis import DavisDataset
from premvos_tpu.data.crops import DavisObjectCrops
from premvos_tpu.train.train_reid import train_reid
from premvos_tpu.models.reid import ReIDNet
from premvos_tpu.stages.reid import run_reid, reid_similarity
from premvos_tpu.data.preprocess import IMAGENET_MEAN, IMAGENET_STD
from premvos_tpu.parallel.mesh import make_mesh

ROOT = "/tmp/vosbench128c/data"
cfg = bench_config(canvas=(128, 192))
rcfg = cfg.reid
ds_train = DavisDataset(ROOT, split="train")
ds_val = DavisDataset(ROOT, split="val")
crops_ds = DavisObjectCrops(ds_train, rcfg.crop_size, (128, 192), max_objects=4)
print("identities:", len(crops_ds.ids), flush=True)
mesh = make_mesh(1)

def retrieval(model, params):
    """Per val sequence: frame-0 GT anchors vs every later frame's GT
    crops; top-1 id accuracy + margin stats."""
    hits = tot = 0
    margins = []
    for seq in ds_val.sequences:
        d = ds_val.load_sequence(seq, 128, 192, cfg.pipeline.max_objects)
        def embed(fidx):
            img = (np.asarray(d["frames"][fidx], np.float32)/255.0 - IMAGENET_MEAN)/IMAGENET_STD
            lab = np.asarray(d["gt_labels"][fidx])
            bs, vs = [], []
            for k2 in (1, 2):
                ys, xs = np.nonzero(lab == k2)
                if len(ys) == 0: bs.append([0,0,1,1]); vs.append(False); continue
                bs.append([xs.min(), ys.min(), xs.max()+1, ys.max()+1]); vs.append(True)
            b = np.pad(np.asarray(bs, np.float32), ((0,6),(0,0)))
            v = np.asarray(vs + [False]*6)
            e = np.asarray(run_reid(model, params, jnp.asarray(img),
                                    jnp.asarray(b), jnp.asarray(v), rcfg.crop_size))
            return e[:2], np.asarray(vs)
        ref, vref = embed(0)
        for t in range(2, 24, 3):
            et, vt = embed(t)
            if not (vref.all() and vt.all()):
                continue
            sim = np.asarray(reid_similarity(jnp.asarray(ref), jnp.asarray(et), 1.0))
            for k2 in range(2):
                tot += 1
                if sim[k2].argmax() == k2: hits += 1
                margins.append(sim[k2, k2] - sim[k2, 1-k2])
    return hits/max(tot,1), float(np.mean(margins)), float(np.min(margins))

out = {}
for name, l2 in (("raw", False), ("l2norm", True)):
    rc = dataclasses.replace(rcfg, l2_normalize=l2)
    t0 = time.time()
    params, loss = train_reid(crops_ds, rc, steps=800, p=4, k=4,
                              learning_rate=3e-4, seed=0, mesh=mesh, log_every=400)
    model = ReIDNet(cfg=rc)
    acc, mmean, mmin = retrieval(model, params)
    out[name] = {"loss": round(float(loss),4), "top1": round(acc,4),
                 "margin_mean": round(mmean,4), "margin_min": round(mmin,4),
                 "train_s": round(time.time()-t0)}
    print(name, out[name], flush=True)
print(json.dumps(out))
