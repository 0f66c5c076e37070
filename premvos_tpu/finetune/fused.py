"""Fused per-video fine-tuning: augmentation + train step in ONE jitted scan.

Round-3 accounting showed per-video fine-tuning dominating the end-to-end
cost (BENCH_r03: 4,779 s/video against a ~48 ms/frame inference pipeline) —
exactly the reference's own cost profile (SURVEY.md §3.2: the per-video
fine-tune loops are its dominant wall-clock). The reference runs a Python
step loop around sess.run with a pre-generated augmentation pool on disk;
the round-3 port of that shape (host pool → device, one dispatch per step)
inherited both the host augmentation cost (~0.11 s/aug) and a per-dispatch
relay overhead measured in seconds on this platform.

This module is the TPU-native redesign (VERDICT r3 item 1, SURVEY §7 hard
part #4):

  * **Everything on device.** Each train step GENERATES its batch on device
    (finetune.lucid_device) — lucid-dream augmentation, example/target
    synthesis, forward, backward, update — no host in the loop at all.
  * **One dispatch per `chunk` steps** via `lax.scan` (default 25): dispatch
    overhead amortizes to noise, and XLA overlaps augmentation with the
    backward pass across scan iterations.
  * **Fresh draws every step**: the reference's fixed ~2,500-sample pool is
    replaced by unbounded on-the-fly sampling — every step sees a brand-new
    augmentation, so a 500-step run at batch 8 trains on 4,000 unique
    samples (>2,500-aug parity; pool-size ablation in
    docs/SYNTHETIC_BENCHMARK.json).
  * **Reduced-resolution proposal fine-tune** (`FinetuneConfig
    .proposal_scale`): detection fine-tuning learns the video's appearance,
    not its resolution; at scale s the conv cost drops ~1/s² (measured
    accuracy impact recorded with the steps-knee ablation).
  * DP across the mesh: every shard generates its own decorrelated
    sub-batch (fold_in on axis_index); gradients pmean over ICI.

The host-pool path (`finetune.finetune_refine` / `finetune_proposals`)
remains as the reference-shaped oracle; `FinetuneConfig.method` selects.
"""

from __future__ import annotations

import numpy as np
import optax

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from premvos_tpu.config import FinetuneConfig, RefineConfig
from premvos_tpu.data.preprocess import IMAGENET_MEAN, IMAGENET_STD
from premvos_tpu.finetune.lucid_device import (
    lucid_frame, perturb_mask_device,
)
from premvos_tpu.stages.refine import expand_boxes, interp_precision
from premvos_tpu.train.trainer import (
    TrainState, create_train_state, replicate_state,
)


def _prep_consts(frame0, lab0, mesh, max_objects, background=None, hw=None):
    """Host-side one-time prep: inpaint the background (the single remaining
    host job), split labels into padded mask slots, optionally resize to
    `hw`, upload replicated."""
    import cv2

    from premvos_tpu.data.lucid import inpaint_background
    from premvos_tpu.finetune.finetune import labels_to_boxes_masks

    frame0 = np.asarray(frame0, np.uint8)
    lab0 = np.asarray(lab0)
    if background is None:
        background = inpaint_background(frame0, lab0.astype(np.int32))
    if hw is not None and tuple(hw) != frame0.shape[:2]:
        h, w = hw
        frame0 = cv2.resize(frame0, (w, h), interpolation=cv2.INTER_AREA)
        background = cv2.resize(background, (w, h),
                                interpolation=cv2.INTER_AREA)
        lab0 = cv2.resize(
            lab0.astype(np.int32), (w, h), interpolation=cv2.INTER_NEAREST
        )
    _, masks, valid = labels_to_boxes_masks(lab0, max_objects)
    rep = NamedSharding(mesh, P())
    put = lambda x: jax.device_put(jnp.asarray(x), rep)
    return (
        put(frame0.astype(np.float32)),
        put(masks.astype(np.float32)),
        put(valid),
        put(background.astype(np.float32)),
    )


def make_fused_scan(batch_loss, tx, mesh, chunk: int, axis: str = "data"):
    """Build run(state, consts, base_key) executing `chunk` fused
    augment+train steps in one jitted lax.scan over the mesh.

    batch_loss(params, key, consts) -> scalar per-shard loss; `key` is
    already decorrelated per shard and per step. Returns (state, last_loss).
    """

    def _chunk(state: TrainState, consts, base_key):
        dkey = jax.random.fold_in(base_key, jax.lax.axis_index(axis))

        def body(st, _):
            key = jax.random.fold_in(dkey, st.step)
            loss, grads = jax.value_and_grad(batch_loss)(
                st.params, key, consts
            )
            grads = jax.lax.pmean(grads, axis)
            loss = jax.lax.pmean(loss, axis)
            updates, opt_state = tx.update(grads, st.opt_state, st.params)
            params = optax.apply_updates(st.params, updates)
            return TrainState(params, opt_state, st.step + 1), loss

        state, losses = jax.lax.scan(body, state, None, length=chunk)
        return state, losses[-1]

    sharded = shard_map(
        _chunk,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    # Donate the train state: params + Adam moments are pure carry, and
    # without donation the compiled program double-buffers them (~0.5 GB at
    # ResNet-101 scale — part of the round-4 480p OOM; docs/MEMORY_BUDGET
    # .md). Callers must hand in a state they own (_fresh_state copies).
    return jax.jit(sharded, donate_argnums=(0,))


def _fresh_state(params, tx, mesh) -> TrainState:
    """Donation-safe replicated train state: copies the params so donating
    the state can never invalidate the caller's base checkpoint (device_put
    of an already-replicated tree is a no-op alias, not a copy)."""
    params = jax.tree.map(jnp.copy, params)
    return replicate_state(create_train_state(params, tx), mesh)


def chunk_lengths(steps_list, chunk: int) -> set:
    """Scan lengths _run_chunks will dispatch for these step counts: the
    full chunk plus each nonzero remainder (so one build can serve a whole
    steps-vs-J&F curve without per-candidate retracing)."""
    need = set()
    for s in steps_list:
        s = int(s)
        if s >= chunk:
            need.add(chunk)
        rem = s % chunk if s >= chunk else s
        if rem:
            need.add(rem)
    return need or {chunk}


def _run_chunks(run, state, consts, seed, steps, chunk, log_every=0,
                label=""):
    """Drive full chunks + one remainder chunk (at most two compiled
    programs per net); returns (params, final loss)."""
    if steps < 1:
        raise ValueError(
            f"fused fine-tune needs steps >= 1 (got {steps}); with 0 steps "
            "there is no loss to report — use the initial params directly"
        )
    base_key = jax.random.PRNGKey(seed)
    loss = jnp.float32(float("nan"))
    done = 0
    while done < steps:
        n = min(chunk, steps - done)
        state, loss = run[n](state, consts, base_key)
        done += n
        if log_every and (done % max(log_every, 1) < chunk):
            print(f"[finetune-fused{label}] step {done}/{steps} "
                  f"loss={float(loss):.4f}", flush=True)
    return state.params, float(loss)


def _single_box(mask: jnp.ndarray) -> jnp.ndarray:
    """[H, W] mask -> tight xyxy box (whole image if empty)."""
    h, w = mask.shape
    on = mask > 0.5
    cols = jnp.any(on, axis=0)
    rows = jnp.any(on, axis=1)
    xi = jnp.arange(w, dtype=jnp.float32)
    yi = jnp.arange(h, dtype=jnp.float32)
    big = jnp.float32(1e9)
    x1 = jnp.minimum(jnp.min(jnp.where(cols, xi, big)), w - 2.0)
    x2 = jnp.max(jnp.where(cols, xi, -1.0)) + 1.0
    y1 = jnp.minimum(jnp.min(jnp.where(rows, yi, big)), h - 2.0)
    y2 = jnp.max(jnp.where(rows, yi, -1.0)) + 1.0
    return jnp.stack([x1, y1, jnp.maximum(x2, x1 + 1), jnp.maximum(y2, y1 + 1)])


def build_refine_fused_runs(
    model,
    mesh,
    image_hw,
    refine_cfg: RefineConfig = RefineConfig(),
    ft_cfg: FinetuneConfig = FinetuneConfig(),
    max_objects: int = 8,
    steps_list=None,
):
    """Build the jitted fused augment+train scan programs for the refine
    net at the given frame resolution, WITHOUT running them.

    Returns ({n_steps: jitted_run} for the chunk + remainder lengths, tx).
    Split out from finetune_refine_fused so (a) callers that loop over videos can
    cache the compiled runners keyed on (config, shapes) instead of
    retracing per sequence, and (b) the memory-audit tier can lower+compile
    the exact production program and assert its HBM footprint without
    executing a single step (the round-4 480p OOM was only discoverable by
    running).
    """
    from premvos_tpu.train.losses import sigmoid_xent

    n_dev = mesh.devices.size
    bs = max(ft_cfg.batch_size // n_dev, 1)
    s = refine_cfg.crop_size
    prec = interp_precision(refine_cfg.interp_precision)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    h, w = image_hw
    patch = min(ft_cfg.aug_patch, min(h, w))

    def one_example(k, frame255, masks0, valid0, bg255):
        from premvos_tpu.ops.roi_align import crop_and_resize

        k1, k2, k3, k4 = jax.random.split(k, 4)
        img, ms = lucid_frame(
            k1, frame255, masks0, valid0, bg255, patch,
            interp_precision=prec,
        )
        areas = ms.sum((1, 2))
        has = areas > 16.0
        pri = jnp.where(has, jax.random.uniform(k2, (ms.shape[0],)), -1.0)
        j = jnp.argmax(pri)
        m = ms[j]
        ok = has[j]
        box = _single_box(m)
        jx, jy = jax.random.randint(k3, (2,), -8, 9).astype(jnp.float32)
        box = box + jnp.stack([jx, jy, jx, jy])
        box = expand_boxes(box[None], refine_cfg.box_margin, h, w)[0]
        norm = jnp.stack(
            [box[1] / (h - 1), box[0] / (w - 1),
             box[3] / (h - 1), box[2] / (w - 1)]
        )
        img_n = (img / 255.0 - mean) / std
        packed = jnp.concatenate([img_n, m[..., None]], -1)
        crop = crop_and_resize(packed, norm[None], s, prec)[0]
        tgt = (crop[..., 3] > 0.5).astype(jnp.float32)
        # coarse channel: morphological perturbation in crop space (the
        # host oracle perturbs at frame res then crops; kernel sizes scale
        # by the crop zoom — distributionally equivalent jitter)
        coarse = perturb_mask_device(k4, tgt)
        x = jnp.concatenate([crop[..., :3], coarse[..., None]], -1)
        return x, tgt, ok

    def batch_loss(p, key, consts):
        keys = jax.random.split(key, bs)
        xs, ys, oks = jax.vmap(
            lambda k: one_example(k, *consts)
        )(keys)
        logits = model.apply(p, xs)
        msk = jnp.broadcast_to(
            oks[:, None, None], logits.shape
        ).astype(jnp.float32)
        return sigmoid_xent(logits, ys, mask=msk)

    tx = optax.adam(ft_cfg.learning_rate)
    chunk = max(int(ft_cfg.chunk), 1)
    runs = {
        n: make_fused_scan(batch_loss, tx, mesh, n)
        for n in chunk_lengths(steps_list or [ft_cfg.steps], chunk)
    }
    return runs, tx


def finetune_refine_fused(
    model,
    params,
    frame0,
    lab0,
    mesh,
    refine_cfg: RefineConfig = RefineConfig(),
    ft_cfg: FinetuneConfig = FinetuneConfig(),
    seed: int = 0,
    max_objects: int = 8,
    log_every: int = 0,
    background=None,
    built=None,
):
    """Per-video refinement-net fine-tune, fully fused on device.

    Mirrors finetune.finetune_refine's example semantics (RGB crop around a
    jittered margin-expanded object box + perturbed-coarse-mask channel →
    GT mask), with the lucid pool replaced by fresh per-step device draws.
    `built` (from build_refine_fused_runs) reuses compiled runners across
    videos. Returns (new_params, final_loss).
    """
    consts = _prep_consts(frame0, lab0, mesh, max_objects, background)
    h, w = consts[0].shape[:2]
    if built is None:
        built = build_refine_fused_runs(
            model, mesh, (h, w), refine_cfg, ft_cfg, max_objects
        )
    runs, tx = built
    state = _fresh_state(params, tx, mesh)
    chunk = max(int(ft_cfg.chunk), 1)
    return _run_chunks(runs, state, consts, seed, ft_cfg.steps, chunk,
                       log_every, label="-refine")


def proposal_finetune_hw(frame_hw, ft_cfg: FinetuneConfig):
    """Default Mask R-CNN fine-tune resolution: the frame scaled by
    ft_cfg.proposal_scale, rounded to the backbone's 32-px grid."""
    fh, fw = frame_hw
    sc = float(ft_cfg.proposal_scale)
    return (
        max(round(fh * sc / 32) * 32, 64),
        max(round(fw * sc / 32) * 32, 64),
    )


def build_proposal_fused_runs(
    model,
    proposal_cfg,
    mesh,
    image_hw,
    ft_cfg: FinetuneConfig = FinetuneConfig(),
    max_objects: int = 8,
    steps_list=None,
):
    """Build the jitted fused augment+train scans for the Mask R-CNN
    fine-tune at image_hw (see build_refine_fused_runs for why this is
    split out). Returns ({n_steps: jitted_run}, tx)."""
    from premvos_tpu.models.anchors import pyramid_anchors
    from premvos_tpu.train.detection import maskrcnn_loss_fn

    h, w = image_hw
    anchors = {
        k: jnp.asarray(v)
        for k, v in pyramid_anchors(
            h, w, proposal_cfg.anchor_scales, proposal_cfg.anchor_ratios
        ).items()
    }
    base_loss = maskrcnn_loss_fn(model, anchors, proposal_cfg, (h, w))

    n_dev = mesh.devices.size
    bs = max(max(1, ft_cfg.batch_size // 2) // n_dev, 1)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    patch = min(ft_cfg.aug_patch, min(h, w))

    def batch_loss(p, key, consts):
        from premvos_tpu.pipeline.runner import boxes_from_masks

        frame255, masks0, valid0, bg255 = consts
        k1, k2 = jax.random.split(key)
        keys = jax.random.split(k1, bs)
        imgs, ms = jax.vmap(
            lambda k: lucid_frame(k, frame255, masks0, valid0, bg255, patch)
        )(keys)
        boxes = jax.vmap(boxes_from_masks)(ms)
        valid = ms.sum((2, 3)) > 4.0
        imgs_n = (imgs / 255.0 - mean) / std
        seeds = jax.random.randint(
            k2, (bs,), 0, jnp.iinfo(jnp.int32).max
        ).astype(jnp.uint32)
        return base_loss(p, (imgs_n, boxes, ms, valid, seeds))

    tx = optax.adam(ft_cfg.learning_rate)
    chunk = max(int(ft_cfg.chunk), 1)
    runs = {
        n: make_fused_scan(batch_loss, tx, mesh, n)
        for n in chunk_lengths(steps_list or [ft_cfg.steps], chunk)
    }
    return runs, tx


def finetune_proposals_fused(
    model,
    params,
    proposal_cfg,
    frame0,
    lab0,
    mesh,
    ft_cfg: FinetuneConfig = FinetuneConfig(),
    seed: int = 0,
    max_objects: int = 8,
    log_every: int = 0,
    background=None,
    image_hw=None,
    built=None,
):
    """Per-video Mask R-CNN fine-tune, fully fused on device.

    image_hw defaults to frame0's shape scaled by ft_cfg.proposal_scale
    (rounded to the backbone's 32-px grid) — detection fine-tuning learns
    appearance, not resolution, and conv cost drops ~scale². Anchors are
    rebuilt for the fine-tune resolution. `built` (from
    build_proposal_fused_runs) reuses compiled runners across videos.
    Returns (new_params, final_loss).
    """
    if image_hw is None:
        image_hw = proposal_finetune_hw(np.asarray(frame0).shape[:2], ft_cfg)
    h, w = image_hw
    if built is None:
        built = build_proposal_fused_runs(
            model, proposal_cfg, mesh, image_hw, ft_cfg, max_objects
        )
    runs, tx = built
    consts = _prep_consts(frame0, lab0, mesh, max_objects, background,
                          hw=(h, w))
    state = _fresh_state(params, tx, mesh)
    chunk = max(int(ft_cfg.chunk), 1)
    return _run_chunks(runs, state, consts, seed, ft_cfg.steps, chunk,
                       log_every, label="-prop")


def finetune_video(
    models,
    params,
    frame0,
    lab0,
    mesh,
    cfg,
    ft_cfg: FinetuneConfig | None = None,
    seed: int = 0,
    log_every: int = 0,
    built: dict | None = None,
):
    """Method-dispatching per-video fine-tune for both nets.

    FinetuneConfig.method selects the fused on-device path (default) or the
    reference-shaped host-pool oracle (finetune.finetune). Returns
    (params', {"refine": loss, "proposal": loss})."""
    ft = ft_cfg or cfg.finetune
    if ft.method == "fused":
        return finetune_video_fused(
            models, params, frame0, lab0, mesh, cfg, ft_cfg=ft, seed=seed,
            log_every=log_every, built=built,
        )
    from premvos_tpu.finetune.finetune import (
        build_lucid_pool, finetune_proposals, finetune_refine,
    )
    from premvos_tpu.pipeline.runner import get_anchors

    frame0 = np.asarray(frame0, np.uint8)
    lab0 = np.asarray(lab0)
    pool = build_lucid_pool(frame0, lab0, ft, seed=seed)
    new_refine, loss_r = finetune_refine(
        models.refine, params["refine"], frame0, lab0, mesh, cfg.refine,
        ft, seed=seed, pool=pool,
    )
    new_prop, loss_p = finetune_proposals(
        models.maskrcnn, params["maskrcnn"], get_anchors(cfg),
        cfg.proposal, frame0, lab0, mesh, ft, seed=seed,
        max_objects=cfg.pipeline.max_objects, pool=pool,
    )
    return (
        dict(params, refine=new_refine, maskrcnn=new_prop),
        {"refine": loss_r, "proposal": loss_p},
    )


def build_fused_runner(models, cfg, mesh, ft_cfg: FinetuneConfig | None = None,
                       image_hw=None, steps_list=None):
    """Pre-build both nets' fused runners for a fixed frame resolution.

    Every sequence in a dataset run shares the pipeline canvas
    (cfg.pipeline.image_height/width), so one build serves all videos —
    pass the result to finetune_video(..., built=...) to avoid retracing
    and recompiling the fused scan per sequence (ADVICE r4)."""
    ft = ft_cfg or cfg.finetune
    if image_hw is None:
        image_hw = (cfg.pipeline.image_height, cfg.pipeline.image_width)
    refine_built = build_refine_fused_runs(
        models.refine, mesh, image_hw, cfg.refine, ft,
        cfg.pipeline.max_objects, steps_list=steps_list,
    )
    prop_hw = proposal_finetune_hw(image_hw, ft)
    prop_built = build_proposal_fused_runs(
        models.maskrcnn, cfg.proposal, mesh, prop_hw, ft,
        cfg.pipeline.max_objects, steps_list=steps_list,
    )
    return {"refine": refine_built, "proposal": prop_built,
            "proposal_hw": prop_hw, "image_hw": tuple(image_hw)}


def finetune_video_fused(
    models,
    params,
    frame0,
    lab0,
    mesh,
    cfg,
    ft_cfg: FinetuneConfig | None = None,
    seed: int = 0,
    log_every: int = 0,
    built: dict | None = None,
):
    """Fine-tune both nets for one video (the full reference regime,
    SURVEY §3.2); shares one host inpainting. `built` (from
    build_fused_runner) reuses compiled programs across videos.
    Returns (params', losses)."""
    from premvos_tpu.data.lucid import inpaint_background

    ft = ft_cfg or cfg.finetune
    frame0 = np.asarray(frame0, np.uint8)
    lab0 = np.asarray(lab0)
    bg = inpaint_background(frame0, lab0.astype(np.int32))
    new_refine, loss_r = finetune_refine_fused(
        models.refine, params["refine"], frame0, lab0, mesh, cfg.refine,
        ft, seed=seed, max_objects=cfg.pipeline.max_objects,
        log_every=log_every, background=bg,
        built=built["refine"] if built else None,
    )
    new_prop, loss_p = finetune_proposals_fused(
        models.maskrcnn, params["maskrcnn"], cfg.proposal, frame0, lab0,
        mesh, ft, seed=seed, max_objects=cfg.pipeline.max_objects,
        log_every=log_every, background=bg,
        image_hw=built["proposal_hw"] if built else None,
        built=built["proposal"] if built else None,
    )
    return (
        dict(params, refine=new_refine, maskrcnn=new_prop),
        {"refine": loss_r, "proposal": loss_p},
    )
