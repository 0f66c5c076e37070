"""DAVIS J&F evaluation, in-repo.

The reference relies on the external official `davis2017-evaluation` package
(SURVEY.md L6); the measures themselves are small and well-specified
(Perazzi et al., CVPR 2016):

  * J — region similarity: IoU between predicted and GT object masks.
  * F — boundary accuracy: F-measure of boundary precision/recall where a
    boundary pixel matches if a counterpart lies within a tolerance radius
    (0.008 · image diagonal, the official default), implemented via
    morphological dilation exactly like the official evaluator.

Protocol (official semi-supervised): score frames 1..T−2 — the first frame
is the given annotation and the last frame is excluded.

Pure numpy/cv2, CPU-side (runs on dumped label maps, not on device).
"""

from __future__ import annotations

import cv2
import numpy as np


def _boundary(mask: np.ndarray) -> np.ndarray:
    """Binary boundary map: pixels of `mask` adjacent to background."""
    m = mask.astype(np.uint8)
    k = np.ones((3, 3), np.uint8)
    er = cv2.erode(m, k, iterations=1)
    return (m - er).astype(bool)


def j_measure(pred: np.ndarray, gt: np.ndarray) -> float:
    """IoU of two binary masks; defined as 1 when both are empty."""
    p, g = pred.astype(bool), gt.astype(bool)
    union = np.logical_or(p, g).sum()
    if union == 0:
        return 1.0
    return float(np.logical_and(p, g).sum()) / float(union)


def f_measure(pred: np.ndarray, gt: np.ndarray, bound_th: float = 0.008) -> float:
    """Boundary F-measure with tolerance radius bound_th · image diagonal."""
    p, g = pred.astype(bool), gt.astype(bool)
    if not p.any() and not g.any():
        return 1.0
    if not p.any() or not g.any():
        return 0.0

    h, w = pred.shape
    radius = max(1, int(np.ceil(bound_th * np.sqrt(h * h + w * w))))
    kernel = cv2.getStructuringElement(
        cv2.MORPH_ELLIPSE, (2 * radius + 1, 2 * radius + 1)
    )

    pb = _boundary(p)
    gb = _boundary(g)
    pb_dil = cv2.dilate(pb.astype(np.uint8), kernel).astype(bool)
    gb_dil = cv2.dilate(gb.astype(np.uint8), kernel).astype(bool)

    precision = (
        np.logical_and(pb, gb_dil).sum() / pb.sum() if pb.sum() else 0.0
    )
    recall = np.logical_and(gb, pb_dil).sum() / gb.sum() if gb.sum() else 0.0
    if precision + recall == 0:
        return 0.0
    return float(2 * precision * recall / (precision + recall))


def evaluate_sequence(
    pred_labels: np.ndarray, gt_labels: np.ndarray, num_objects: int
) -> dict:
    """Per-sequence J&F over label maps [T, H, W] (0 = background).

    Returns {"J": mean, "F": mean, "J&F": mean, "per_object": {...}} over
    frames 1..T−2 (official protocol).
    """
    t = pred_labels.shape[0]
    frames = range(1, max(t - 1, 2))  # skip annotated first + excluded last
    per_object = {}
    js, fs = [], []
    for obj in range(1, num_objects + 1):
        oj, of = [], []
        for fi in frames:
            p = pred_labels[fi] == obj
            g = gt_labels[fi] == obj
            oj.append(j_measure(p, g))
            of.append(f_measure(p, g))
        per_object[obj] = {"J": float(np.mean(oj)), "F": float(np.mean(of))}
        js.append(np.mean(oj))
        fs.append(np.mean(of))
    j, f = float(np.mean(js)), float(np.mean(fs))
    return {"J": j, "F": f, "J&F": (j + f) / 2, "per_object": per_object}


def evaluate_dataset(results: list[dict]) -> dict:
    """Aggregate per-sequence results (list of evaluate_sequence outputs,
    mean over all objects of all sequences — official global mean)."""
    js = [o["J"] for r in results for o in r["per_object"].values()]
    fs = [o["F"] for r in results for o in r["per_object"].values()]
    j, f = float(np.mean(js)), float(np.mean(fs))
    return {"J": j, "F": f, "J&F": (j + f) / 2}
