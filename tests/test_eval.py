import numpy as np
import pytest

from premvos_tpu.eval.davis_eval import (
    evaluate_dataset,
    evaluate_sequence,
    f_measure,
    j_measure,
)


def test_j_measure():
    a = np.zeros((10, 10), bool)
    b = np.zeros((10, 10), bool)
    a[:5] = True
    b[3:8] = True
    assert j_measure(a, b) == pytest.approx(20 / 80)
    assert j_measure(a, a) == 1.0
    assert j_measure(np.zeros((4, 4)), np.zeros((4, 4))) == 1.0
    assert j_measure(a, np.zeros((10, 10))) == 0.0


def test_f_measure_perfect_and_disjoint():
    m = np.zeros((64, 64), bool)
    m[20:40, 20:40] = True
    assert f_measure(m, m) == 1.0
    other = np.zeros((64, 64), bool)
    other[50:60, 50:60] = True
    assert f_measure(m, other) < 0.2
    assert f_measure(m, np.zeros_like(m)) == 0.0


def test_f_measure_tolerates_small_shift():
    m = np.zeros((480, 854), bool)
    m[100:300, 200:600] = True
    shifted = np.roll(m, 2, axis=1)  # 2px shift ≪ 0.008·diag (~8px)
    assert f_measure(m, shifted) == 1.0
    far = np.roll(m, 40, axis=1)  # ≫ tolerance: vertical edges all miss
    assert f_measure(m, far) < f_measure(m, shifted)
    assert f_measure(m, far) < 0.75


def test_evaluate_sequence_perfect():
    t, h, w = 5, 32, 32
    labels = np.zeros((t, h, w), np.int32)
    labels[:, 5:15, 5:15] = 1
    labels[:, 20:30, 20:30] = 2
    r = evaluate_sequence(labels, labels, 2)
    assert r["J"] == 1.0 and r["F"] == 1.0 and r["J&F"] == 1.0


def test_evaluate_sequence_ignores_first_and_last():
    t, h, w = 5, 32, 32
    gt = np.zeros((t, h, w), np.int32)
    gt[:, 5:15, 5:15] = 1
    pred = gt.copy()
    pred[0] = 0  # wrong first frame — not scored
    pred[-1] = 0  # wrong last frame — not scored
    r = evaluate_sequence(pred, gt, 1)
    assert r["J"] == 1.0


def test_evaluate_dataset_aggregates():
    t, h, w = 4, 16, 16
    gt = np.zeros((t, h, w), np.int32)
    gt[:, 2:10, 2:10] = 1
    perfect = evaluate_sequence(gt, gt, 1)
    empty = evaluate_sequence(np.zeros_like(gt), gt, 1)
    agg = evaluate_dataset([perfect, empty])
    assert agg["J"] == pytest.approx(0.5)
