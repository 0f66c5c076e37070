"""The five PReMVOS stages as pure padded functions (SURVEY.md §3)."""

from premvos_tpu.stages.flow import run_flow_pairs, warp_masks
from premvos_tpu.stages.merge import (
    TrackState,
    greedy_assign,
    init_state,
    merge_frame,
    resolve_pixels,
    score_matrix,
)
from premvos_tpu.stages.proposals import proposal_masks_fullres, run_proposals
from premvos_tpu.stages.refine import (
    expand_boxes,
    make_refine_crops,
    refined_fullres,
    run_refine,
)
from premvos_tpu.stages.reid import (
    make_reid_crops,
    pairwise_sq_distances,
    reid_similarity,
    run_reid,
)

__all__ = [
    "run_flow_pairs", "warp_masks",
    "TrackState", "greedy_assign", "init_state", "merge_frame",
    "resolve_pixels", "score_matrix",
    "proposal_masks_fullres", "run_proposals",
    "expand_boxes", "make_refine_crops", "refined_fullres", "run_refine",
    "make_reid_crops", "pairwise_sq_distances", "reid_similarity", "run_reid",
]
