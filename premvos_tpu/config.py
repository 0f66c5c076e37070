"""Single dataclass config tree for the whole pipeline.

The reference has three disjoint config systems (SURVEY.md C13–C15,
unverified — mount was empty): module-level constants for Mask R-CNN
(`MaskRCNN/config.py`), JSON files + a typed `Config` class for the
OnAVOS-family refinement/ReID nets, and argparse flags for the flow net.
Here: one typed tree, JSON-loadable so run presets can mirror the
reference's configs (configs/*.json).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field


@dataclass(frozen=True)
class ProposalConfig:
    """Mask R-CNN-style category-agnostic proposal generator (SURVEY C1)."""

    backbone_depth: int = 101  # ResNet-101 per the PReMVOS paper
    fpn_channels: int = 256
    # Anchors: one scale per FPN level P2..P6, 3 aspect ratios.
    anchor_scales: tuple = (32.0, 64.0, 128.0, 256.0, 512.0)
    anchor_ratios: tuple = (0.5, 1.0, 2.0)
    rpn_pre_nms_topk: int = 512  # padded static top-k per level
    rpn_post_nms_topk: int = 256
    rpn_nms_threshold: float = 0.7
    detections_per_frame: int = 32  # "~20 proposals/frame" padded with headroom
    detection_nms_threshold: float = 0.5
    # PReMVOS keeps a LOW score threshold for high recall (~20 props/frame).
    detection_score_threshold: float = 0.05
    roi_align_size: int = 7
    mask_roi_align_size: int = 14
    mask_resolution: int = 28
    num_classes: int = 2  # category-agnostic: object vs background
    # frozen_bn: pretrained/finetune regime; group_norm: from-scratch training.
    norm: str = "frozen_bn"
    # RPN objectness supervision. "dense": sigmoid focal loss over ALL
    # anchors (TPU-first: no per-step sampling gathers, and every anchor of
    # every FPN level gets negative pressure — the reference's 256-sample
    # balanced scheme leaves rarely-sampled levels uncalibrated, which at
    # some resolutions floods joint NMS with confident garbage from an
    # unused level). "sampled": the reference recipe (tensorpack-style
    # balanced 256-anchor sample).
    rpn_loss: str = "dense"
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0


@dataclass(frozen=True)
class RefineConfig:
    """DeepLabv3+-style proposal refinement net (SURVEY C2)."""

    crop_size: int = 385  # reference crops 385×385 around the expanded box
    box_margin: float = 50.0  # pixels of context around the proposal box
    # "resnet" (default, MXU-dense) or "xception65" (paper §3.2 parity).
    backbone: str = "resnet"
    backbone_depth: int = 50
    norm: str = "frozen_bn"
    output_stride: int = 16
    aspp_rates: tuple = (6, 12, 18)
    aspp_channels: int = 256
    decoder_channels: int = 256
    low_level_channels: int = 48
    # 4th input channel encodes the coarse mask/box prior.
    in_channels: int = 4
    # Matmul precision of the crop/paste interpolation einsums
    # ("highest" = full fp32, the parity default; "default" = bf16 — these
    # einsums are ~70 GFLOP/frame at 32×385² scale, and bf16's ~0.4 % weight
    # error sits below the 1/255 image quantization; J&F impact measured in
    # docs/SYNTHETIC_BENCHMARK.json).
    interp_precision: str = "highest"


@dataclass(frozen=True)
class FlowConfig:
    """FlowNet2-style optical flow (SURVEY C3)."""

    variant: str = "flownet2"  # flownetc | flownet2cs | flownet2css | flownet2
    max_displacement: int = 20
    corr_stride: int = 2
    # Inference resolution must be a multiple of 64 (6 stride-2 stages).
    infer_height: int = 448
    infer_width: int = 832
    div_flow: float = 20.0  # reference trains on flow/20, rescales at output
    # In-net warp implementation: "block" (block-sliced residual-window
    # warp, ~10× faster on TPU, exact for smooth flow) | "gather" (XLA
    # per-pixel gather — the reference-exact oracle).
    warp_impl: str = "block"


@dataclass(frozen=True)
class ReIDConfig:
    """Triplet-loss embedding net (SURVEY C4)."""

    backbone_depth: int = 50
    embedding_dim: int = 128
    crop_size: int = 128
    triplet_margin: float = 0.2  # batch-hard triplet (Hermans et al.)
    norm: str = "frozen_bn"
    # L2-normalize the embedding INSIDE the net (train + inference on the
    # unit sphere). Without this, batch-hard triplet can satisfy the margin
    # radially (identity encoded in magnitude, direction collapsed), which
    # the merge's scale-free exp(−d²/σ²) similarity then cannot see — see
    # docs/SELECTION_DIAGNOSIS.md (measured: raw inter-id distance 10 vs
    # intra 0.9–6, but normalized sims all ≥0.95; training on the sphere
    # lifts the held-out sim margin 0.037 → 0.428 at equal steps).
    # Inference-parity note: reid_similarity normalizes its inputs anyway,
    # so this flag cannot change inference behavior for raw-trained or
    # converted checkpoints — it only changes what the triplet loss sees.
    l2_normalize: bool = True


@dataclass(frozen=True)
class MergeConfig:
    """Greedy merge/track scoring (SURVEY C5).

    score = w_objectness·score + w_reid·reid_sim + w_warp·warp_iou
            − w_overlap·inter-object-overlap
    """

    w_objectness: float = 1.0
    w_reid: float = 1.0
    w_warp: float = 1.0
    w_overlap: float = 1.0
    mask_threshold: float = 0.5
    reid_sigma: float = 1.0  # reid_sim = exp(−dist²/σ²)
    new_object_score_floor: float = 0.0
    # Warp resolution divisor: 1 = exact per-pixel gather (reference
    # semantics, the default); s>1 warps on a 1/s grid + bilinear upsample
    # (gathers are the least TPU-friendly op in the merge scan: stride 2 cut
    # 13.9→3.2 ms/frame at 480p with overlap-level parity — see
    # docs/STAGE_BUDGET.md). Perf presets (configs/davis2017_val.json,
    # bench.py) opt into 2; held-out accuracy at both strides is recorded in
    # docs/SYNTHETIC_BENCHMARK.json.
    warp_stride: int = 1
    # Mask-warp implementation: "block" | "gather" (see FlowConfig.warp_impl).
    warp_impl: str = "block"
    # Per-frame decay of the warp term while a track is coasting (not
    # selected): effective w_warp ∝ warp_decay**staleness. 1.0 = reference
    # semantics (stale warped priors count fully). <1 keeps a long-occluded
    # track's drifted prior from overriding ReID at re-acquisition — this is
    # where the reference's merge loses tracks that disappear (SURVEY C5).
    warp_decay: float = 1.0
    # EMA rate folding the assigned proposal's embedding into the track's
    # reference embedding. 0.0 = reference semantics (frame-0 GT anchor
    # only). >0 adapts the anchor to appearance drift (scale change etc.).
    reid_ema: float = 0.0
    # ReID-gated relief of the score floor: a track whose assigned proposal
    # misses new_object_score_floor is still accepted when its ReID
    # similarity (exp(−d²/σ²) ∈ (0, 1]) is at least this threshold. This is
    # the re-acquisition half of the floor trade-off diagnosed in
    # docs/SELECTION_DIAGNOSIS.md: the floor blocks identity-swap cascades
    # (a swapped pick scores low because it is the WRONG object — low sim),
    # but it also rejects camouflage re-appearances whose only strong term
    # IS the ReID similarity. Gating the relief on sim keeps the anti-swap
    # property (sphere-trained ReID separates right/wrong by a 0.43 margin)
    # while restoring re-acquisition. >1.0 = disabled = reference semantics.
    reid_reacquire: float = 2.0


@dataclass(frozen=True)
class PipelineConfig:
    """Fused HBM-resident pipeline over a frame scan."""

    image_height: int = 480
    image_width: int = 864  # 854 padded to a 32-multiple for the backbone
    max_objects: int = 8  # DAVIS-2017 max instances per sequence is ≤ ~10
    max_proposals: int = 32  # = ProposalConfig.detections_per_frame
    dtype: str = "bfloat16"  # compute dtype; params stay float32
    mesh_axis: str = "data"  # sequences sharded across chips
    # Frames per batched stage dispatch. Stages 1–4 (proposals, refine,
    # flow, ReID) have no frame-to-frame dependency — only the merge does —
    # so they run batched over scan_chunk frames and only the merge scans
    # frame-by-frame. 1 recovers the fully sequential round-1 path.
    scan_chunk: int = 8


@dataclass(frozen=True)
class FinetuneConfig:
    """Per-video lucid-dream fine-tuning (SURVEY §3.2).

    method "fused" (default): augmentation + train step fused in one jitted
    scan on device, fresh lucid draws every step (finetune/fused.py) — the
    TPU-native path. method "pool": host-generated cv2 augmentation pool,
    one dispatch per step (finetune/finetune.py) — the reference-shaped
    oracle, ~40× slower end-to-end on this platform.
    """

    num_augmentations: int = 2500  # pool method only; fused draws per step
    # Steps-vs-J&F knee (docs/SYNTHETIC_BENCHMARK.json finetune.curve /
    # select_curve, selected on the tune split): on the synthetic benchmark
    # — where the general nets are already in-domain — the knee is at the
    # SMALLEST measured count (50 steps, J&F 0.5823) and accuracy falls
    # monotonically beyond it, while cost grows linearly. 500 is kept as
    # the production default for reference parity on real out-of-domain
    # video (the reference fine-tunes on ~2500 lucid augmentations,
    # SURVEY §3.2); bench.py measures and amortizes this exact step count
    # into the headline vs_baseline, so the default is the conservative
    # (most expensive) choice, not a benchmark-flattering one.
    steps: int = 500
    learning_rate: float = 1e-4
    batch_size: int = 8
    method: str = "fused"  # "fused" | "pool"
    # Steps per fused dispatch (lax.scan length). Amortizes dispatch
    # overhead (~45 ms/dispatch measured round 5); two compiled programs
    # max per net (chunk + remainder). Capped at 16: this platform's TPU
    # worker dies ("TPU worker process crashed or restarted") when a
    # single execution runs for roughly a minute — chunk-25 480p scans
    # (~3 min pre-optimization) killed it deterministically, costing
    # ~30-50 min of relay recovery each time (round-5 bisect,
    # docs/MEMORY_BUDGET.md §dispatch). 16 keeps post-optimization 480p
    # dispatches ~8 s with margin while dispatch overhead stays <1 %.
    chunk: int = 16
    # Object-local augmentation patch size (finetune/lucid_device.py):
    # rotation/scale/elastic warps act on PxP patches, not full frames.
    aug_patch: int = 256
    # Fine-tune resolution of the proposal net relative to the inference
    # canvas (rounded to the 32-px backbone grid). Detection fine-tuning
    # learns the video's appearance, not its resolution; conv cost drops
    # ~scale². Accuracy impact measured in docs/SYNTHETIC_BENCHMARK.json.
    proposal_scale: float = 0.5


@dataclass(frozen=True)
class PremvosConfig:
    proposal: ProposalConfig = field(default_factory=ProposalConfig)
    refine: RefineConfig = field(default_factory=RefineConfig)
    flow: FlowConfig = field(default_factory=FlowConfig)
    reid: ReIDConfig = field(default_factory=ReIDConfig)
    merge: MergeConfig = field(default_factory=MergeConfig)
    pipeline: PipelineConfig = field(default_factory=PipelineConfig)
    finetune: FinetuneConfig = field(default_factory=FinetuneConfig)


def _from_dict(cls, d: dict):
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        if dataclasses.is_dataclass(f.type) or (
            isinstance(f.type, str) and f.type.endswith("Config")
        ):
            sub = f.default_factory()  # type: ignore[misc]
            kwargs[f.name] = _from_dict(type(sub), v)
        elif isinstance(v, list):
            kwargs[f.name] = tuple(v)
        else:
            kwargs[f.name] = v
    return cls(**kwargs)


def load_config(path) -> PremvosConfig:
    """Load a JSON preset (partial trees allowed; defaults fill the rest)."""
    with open(path) as f:
        return _from_dict(PremvosConfig, json.load(f))


def save_config(path, cfg: PremvosConfig) -> None:
    with open(path, "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)
