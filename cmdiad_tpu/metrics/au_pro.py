"""AU-PRO: area under the per-region-overlap curve (MVTec 3D-AD protocol).

Reimplements the evaluation protocol of the reference's
``utils/au_pro_util.py`` (itself the official MVTec formulation): PRO values
at 100 thresholds placed at equidistant positions of the sorted anomaly-free
pixel scores, curve prepended with (1,1), trapezoidal integration up to an
FPR limit (0.3 / 0.01) with linear interpolation at the limit, normalised by
the limit.

This implementation is vectorised: per-component overlaps for all thresholds
come from one ``searchsorted`` per component instead of the reference's
incremental pointer loop — identical results, O(C·T·log S).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
from scipy.ndimage import label as connected_components


def compute_pro(anomaly_maps: Sequence[np.ndarray],
                ground_truth_maps: Sequence[np.ndarray],
                num_thresholds: int = 100) -> Tuple[List[float], List[float]]:
    """PRO curve: (fprs, pros) in increasing-FPR order."""
    assert len(anomaly_maps) == len(ground_truth_maps)
    structure = np.ones((3, 3), dtype=int)

    component_scores: List[np.ndarray] = []
    ok_scores: List[np.ndarray] = []
    for gt, pred in zip(ground_truth_maps, anomaly_maps):
        gt = np.asarray(gt)
        pred = np.asarray(pred)
        labeled, n_comp = connected_components(gt, structure)
        ok_scores.append(pred[labeled == 0])
        for k in range(1, n_comp + 1):
            component_scores.append(np.sort(pred[labeled == k]))

    ok = np.sort(np.concatenate(ok_scores))
    n_ok = ok.size
    positions = np.linspace(0, n_ok - 1, num=num_thresholds, dtype=int)
    thresholds = ok[positions]
    fprs = 1.0 - (positions + 1) / n_ok

    # overlap(th) = fraction of component pixels with score > th
    pros = np.zeros(num_thresholds, np.float64)
    for comp in component_scores:
        pros += 1.0 - np.searchsorted(comp, thresholds, side="right") / comp.size
    pros /= max(len(component_scores), 1)

    fprs_list = [1.0] + fprs.tolist()
    pros_list = [1.0] + pros.tolist()
    return fprs_list[::-1], pros_list[::-1]


def _bounded_trapezoid(x: np.ndarray, y: np.ndarray, x_max: float) -> float:
    """Trapezoidal area with an interpolated upper integration bound."""
    finite = np.isfinite(x) & np.isfinite(y)
    x, y = x[finite], y[finite]
    correction = 0.0
    if x_max not in x:
        ins = int(np.searchsorted(x, x_max, side="right"))
        assert 0 < ins < len(x), "x_max outside the curve support"
        y_interp = y[ins - 1] + (y[ins] - y[ins - 1]) * (
            x_max - x[ins - 1]) / (x[ins] - x[ins - 1])
        correction = 0.5 * (y_interp + y[ins - 1]) * (x_max - x[ins - 1])
    keep = x <= x_max
    x, y = x[keep], y[keep]
    return float(np.sum(0.5 * (y[1:] + y[:-1]) * (x[1:] - x[:-1])) + correction)


def calculate_au_pro(gts, predictions, integration_limit: float = 0.3,
                     num_thresholds: int = 100):
    """Area under the PRO curve up to ``integration_limit``, normalised.

    Returns (au_pro, (fprs, pros)) like the reference entry point.
    """
    fprs, pros = compute_pro(predictions, gts, num_thresholds)
    area = _bounded_trapezoid(np.asarray(fprs), np.asarray(pros),
                              integration_limit)
    return area / integration_limit, (fprs, pros)
