"""ROC / AUC / EER evaluation (reference: src/aslp-vad/roc.h,
roc-test.cc; aslp_scripts/vad/calc_auc.sh, calc_eer.sh)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np


@dataclass
class RocPoint:
    threshold: float
    tpr: float  # true positive rate (recall)
    fpr: float  # false alarm rate


def roc_curve(scores: np.ndarray, labels: np.ndarray,
              num_points: int = 100) -> List[RocPoint]:
    scores = np.asarray(scores, np.float64)
    labels = np.asarray(labels, bool)
    pos = labels.sum()
    neg = len(labels) - pos
    if pos == 0 or neg == 0:
        raise ValueError("need both positive and negative labels")
    thresholds = np.quantile(scores, np.linspace(0, 1, num_points))
    points = []
    for th in thresholds:
        pred = scores >= th
        tp = (pred & labels).sum()
        fp = (pred & ~labels).sum()
        points.append(RocPoint(float(th), tp / pos, fp / neg))
    return points


def auc(scores: np.ndarray, labels: np.ndarray) -> float:
    """Exact AUC via rank statistic (Mann-Whitney)."""
    scores = np.asarray(scores, np.float64)
    labels = np.asarray(labels, bool)
    order = np.argsort(scores)
    ranks = np.empty(len(scores), np.float64)
    # average ranks for ties
    sorted_scores = scores[order]
    i = 0
    r = 1
    while i < len(scores):
        j = i
        while j + 1 < len(scores) and sorted_scores[j + 1] == \
                sorted_scores[i]:
            j += 1
        ranks[order[i:j + 1]] = (r + r + (j - i)) / 2.0
        r += j - i + 1
        i = j + 1
    pos = labels.sum()
    neg = len(labels) - pos
    if pos == 0 or neg == 0:
        raise ValueError("need both classes")
    return float(
        (ranks[labels].sum() - pos * (pos + 1) / 2.0) / (pos * neg)
    )


def eer(scores: np.ndarray, labels: np.ndarray) -> float:
    """Equal error rate: where miss rate == false alarm rate."""
    pts = roc_curve(scores, labels, num_points=400)
    best = min(pts, key=lambda p: abs((1 - p.tpr) - p.fpr))
    return float(((1 - best.tpr) + best.fpr) / 2.0)
