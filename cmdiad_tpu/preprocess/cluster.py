"""Largest-cluster connected-component cleaning.

Replaces Open3D's ``cluster_dbscan`` call in the reference
(utils/preprocessing.py:60-92): DBSCAN over the valid points
(eps=0.006, min_points=30), keep only the largest cluster, zero the rest in
both pc and rgb.  Implemented with a scipy cKDTree BFS (density-reachability
exactly as DBSCAN defines it; noise points get label -1 and are removed like
any non-largest cluster).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy.spatial import cKDTree


def dbscan_labels(points: np.ndarray, eps: float = 0.006,
                  min_points: int = 30, prefer_native: bool = True) -> np.ndarray:
    """DBSCAN cluster labels; -1 = noise. min_points includes the point.

    Uses the C++ grid-hashed implementation (cmdiad_tpu.native) when
    available — O(N) candidate generation vs the KD-tree's O(N log N), and
    ~50x faster at MVTec's ~500k-point clouds; this scipy version is the
    reference implementation and fallback.
    """
    if prefer_native:
        try:
            from cmdiad_tpu import native
            labels = native.dbscan(points, eps, min_points)
            if labels is not None:
                return labels.astype(np.int64)
        except Exception:
            pass
    n = len(points)
    tree = cKDTree(points)
    neighbors = tree.query_ball_tree(tree, eps)
    core = np.array([len(nb) >= min_points for nb in neighbors])
    labels = np.full(n, -1, np.int64)
    cluster = 0
    for i in range(n):
        if labels[i] != -1 or not core[i]:
            continue
        # BFS over density-reachable points from core i
        labels[i] = cluster
        queue = [i]
        while queue:
            j = queue.pop()
            if not core[j]:
                continue
            for k in neighbors[j]:
                if labels[k] == -1:
                    labels[k] = cluster
                    queue.append(k)
        cluster += 1
    return labels


def largest_cluster_cleaning(organized_pc: np.ndarray,
                             organized_rgb: np.ndarray,
                             eps: float = 0.006, min_points: int = 30
                             ) -> Tuple[np.ndarray, np.ndarray, int]:
    """Keep only the largest DBSCAN cluster; zero everything else.

    Returns (pc, rgb, n_clusters) — n_clusters for the reference's
    multi-cluster logging (preprocessing.py:71-79).
    """
    flat_pc = organized_pc.reshape(-1, 3).copy()
    flat_rgb = organized_rgb.reshape(-1, organized_rgb.shape[-1]).copy()
    nonzero = np.flatnonzero(np.all(flat_pc != 0, axis=1))
    if len(nonzero) == 0:
        return organized_pc, organized_rgb, 0
    labels = dbscan_labels(flat_pc[nonzero], eps, min_points)
    ids, counts = np.unique(labels, return_counts=True)
    largest = ids[np.argmax(counts)]
    outliers = nonzero[labels != largest]
    flat_pc[outliers] = 0
    flat_rgb[outliers] = 0
    return (flat_pc.reshape(organized_pc.shape),
            flat_rgb.reshape(organized_rgb.shape),
            int(labels.max()) + 1)
