"""RANSAC background-plane removal for organized point clouds.

Replaces the Open3D ``segment_plane`` dependency of the reference
(utils/preprocessing.py:20-57): the background plane is fit on the 10-pixel
border ring of valid points (RANSAC: sample 50 points, least-squares plane,
score by |distance| < 0.004 inliers, 1000 iterations, refit on inliers), then
every point within 0.005 of the plane is zeroed in both pc and rgb.

Pure numpy with a deterministic seed (Open3D's RNG is unseeded upstream);
the per-iteration plane fits are vectorised over all 1000 candidate samples
at once instead of looped — the whole fit is three small batched SVD-free
covariance eigendecompositions.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def border_points(organized_pc: np.ndarray, border: int = 10) -> np.ndarray:
    """Valid (all-nonzero) points of the image border ring (N, 3)."""
    parts = [organized_pc[:border].reshape(-1, 3),
             organized_pc[-border:].reshape(-1, 3),
             organized_pc[:, :border].reshape(-1, 3),
             organized_pc[:, -border:].reshape(-1, 3)]
    pts = np.concatenate(parts, axis=0)
    return pts[np.all(pts != 0, axis=1)]


def _fit_planes_batch(samples: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Least-squares plane per sample set: (B, n, 3) -> normals (B,3), d (B,)."""
    centroid = samples.mean(axis=1, keepdims=True)
    centered = samples - centroid
    cov = np.einsum("bni,bnj->bij", centered, centered)
    # smallest-eigenvalue eigenvector = plane normal
    w, v = np.linalg.eigh(cov)
    normals = v[:, :, 0]
    norms = np.linalg.norm(normals, axis=1, keepdims=True)
    normals = normals / np.maximum(norms, 1e-12)
    d = -np.einsum("bi,bi->b", normals, centroid[:, 0])
    return normals, d


def ransac_plane(points: np.ndarray, distance_threshold: float = 0.004,
                 ransac_n: int = 50, num_iterations: int = 1000,
                 seed: int = 0, prefer_native: bool = True) -> np.ndarray:
    """Best-fit plane (a, b, c, d) with |ax+by+cz+d| as point distance.

    Uses the C++ implementation (cmdiad_tpu.native) when available; this
    numpy version is the reference implementation and fallback.  Both are
    deterministic per seed but draw different sample sequences — any robust
    fit of the same border ring is equivalent downstream.
    """
    if prefer_native and len(points) >= 3:
        try:
            from cmdiad_tpu import native
            plane = native.ransac_plane(points, distance_threshold,
                                        ransac_n, num_iterations, seed)
            if plane is not None:
                return plane
        except Exception:
            pass
    rng = np.random.default_rng(seed)
    n = len(points)
    if n < 3:
        raise ValueError("need at least 3 border points for a plane fit")
    k = min(ransac_n, n)
    idx = rng.integers(0, n, size=(num_iterations, k))
    normals, d = _fit_planes_batch(points[idx])
    dist = np.abs(points @ normals.T + d[None, :])      # (N, iters)
    inliers = (dist < distance_threshold).sum(axis=0)
    best = int(np.argmax(inliers))
    # refit on the best model's inliers (Open3D does the same refinement)
    mask = dist[:, best] < distance_threshold
    if mask.sum() >= 3:
        nrm, dd = _fit_planes_batch(points[mask][None])
        return np.concatenate([nrm[0], [dd[0]]])
    return np.concatenate([normals[best], [d[best]]])


def remove_plane(organized_pc: np.ndarray, organized_rgb: np.ndarray,
                 distance_threshold: float = 0.005, fit_threshold: float = 0.004,
                 seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Zero all points within ``distance_threshold`` of the border plane."""
    plane = ransac_plane(border_points(organized_pc),
                         distance_threshold=fit_threshold, seed=seed)
    flat = organized_pc.reshape(-1, 3)
    dist = np.abs(flat @ plane[:3] + plane[3])
    on_plane = dist < distance_threshold
    pc_out = organized_pc.copy().reshape(-1, 3)
    rgb_out = organized_rgb.copy().reshape(-1, organized_rgb.shape[-1])
    pc_out[on_plane] = 0
    rgb_out[on_plane] = 0
    return (pc_out.reshape(organized_pc.shape),
            rgb_out.reshape(organized_rgb.shape))
