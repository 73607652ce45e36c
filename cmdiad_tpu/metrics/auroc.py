"""ROC-AUC via the rank statistic (Mann–Whitney U).

Replaces sklearn.metrics.roc_auc_score as used by the reference
(features.py:321-322) for binary labels: AUC equals the normalised U
statistic with midranks for ties — identical to the trapezoidal ROC integral
sklearn computes, without materialising the curve.  O(n log n), plain numpy,
suitable for the 224²·n_test pixel-level arrays.
"""

from __future__ import annotations

import numpy as np


def roc_auc_score(labels, scores) -> float:
    """AUC for binary ``labels`` (anything >0.5 is positive)."""
    labels = np.asarray(labels).reshape(-1).astype(np.float64)
    scores = np.asarray(scores).reshape(-1).astype(np.float64)
    pos = labels > 0.5
    n_pos = int(pos.sum())
    n_neg = labels.size - n_pos
    if n_pos == 0 or n_neg == 0:
        raise ValueError("roc_auc_score needs both classes present")

    order = np.argsort(scores, kind="mergesort")
    sorted_scores = scores[order]
    # midranks: average rank over tied groups (1-based)
    ranks = np.empty(scores.size, np.float64)
    idx = np.arange(1, scores.size + 1, dtype=np.float64)
    # vectorised midrank computation via group boundaries
    boundaries = np.flatnonzero(np.diff(sorted_scores)) + 1
    starts = np.concatenate([[0], boundaries])
    ends = np.concatenate([boundaries, [scores.size]])
    mid = (idx[starts.astype(int)] + idx[ends.astype(int) - 1]) / 2.0
    group_of = np.repeat(np.arange(starts.size), ends - starts)
    ranks[order] = mid[group_of]

    u = ranks[pos].sum() - n_pos * (n_pos + 1) / 2.0
    return float(u / (n_pos * n_neg))
