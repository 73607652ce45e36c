"""MVTec 3D-AD offline preprocessing pipeline (in-place dataset rewrite).

Reimplements utils/preprocessing.py:116-177: per tiff — RANSAC background
plane removal, square zero-padding to the next multiple of 100, largest-
DBSCAN-cluster cleaning — rewriting tiff/rgb/gt in place.  The reference
fans out with a ProcessPoolExecutor; here a thread pool is enough because
the hot loops (batched RANSAC, cKDTree) release the GIL in numpy/scipy.
"""

from __future__ import annotations

import concurrent.futures as cf
import math
import os
from pathlib import Path
from typing import Optional

import numpy as np

from cmdiad_tpu.data import tiffio
from cmdiad_tpu.preprocess.plane import remove_plane
from cmdiad_tpu.preprocess.cluster import largest_cluster_cleaning
from cmdiad_tpu.utils.logging import get_logger

log = get_logger(__name__)


def _roundup_100(x: int) -> int:
    return int(math.ceil(x / 100.0)) * 100


def pad_to_square(arr: np.ndarray) -> np.ndarray:
    """Zero-pad to a square whose side is the larger dim rounded up to 100."""
    h, w = arr.shape[:2]
    side = max(_roundup_100(h), _roundup_100(w))
    a = (side - h) // 2
    b = (side - w) // 2
    pad = [(a, side - a - h), (b, side - b - w)]
    if arr.ndim == 3:
        pad.append((0, 0))
    return np.pad(arr, pad, mode="constant")


def preprocess_sample(tiff_path: str, seed: int = 0,
                      write: bool = True) -> dict:
    """Plane-remove + pad + cluster-clean one sample (in place if write)."""
    from PIL import Image
    tiff_path = str(tiff_path)
    rgb_path = tiff_path.replace("xyz", "rgb").replace("tiff", "png")
    gt_path = tiff_path.replace("xyz", "gt").replace("tiff", "png")

    pc = np.asarray(tiffio.imread(tiff_path), np.float32)
    rgb = np.array(Image.open(rgb_path))
    gt = np.array(Image.open(gt_path)) if os.path.isfile(gt_path) else None

    pc, rgb = remove_plane(pc, rgb, seed=seed)
    pc, rgb = pad_to_square(pc), pad_to_square(rgb)
    if gt is not None:
        gt = pad_to_square(gt)
    pc, rgb, n_clusters = largest_cluster_cleaning(pc, rgb)
    if n_clusters > 1:
        log.info("%s has %d clusters (kept largest)", tiff_path, n_clusters)

    if write:
        tiffio.imwrite(tiff_path, pc)
        Image.fromarray(rgb).save(rgb_path)
        if gt is not None:
            Image.fromarray(gt).save(gt_path)
    return {"pc": pc, "rgb": rgb, "gt": gt, "n_clusters": n_clusters}


def preprocess_dataset(dataset_path: str, num_workers: int = 6,
                       seed: int = 0) -> int:
    paths = sorted(Path(dataset_path).rglob("*.tiff"))
    log.info("preprocessing %d tiffs under %s", len(paths), dataset_path)
    with cf.ThreadPoolExecutor(max_workers=num_workers) as pool:
        futures = [pool.submit(preprocess_sample, str(p), seed) for p in paths]
        for i, f in enumerate(cf.as_completed(futures)):
            f.result()
            if (i + 1) % 100 == 0:
                log.info("processed %d/%d", i + 1, len(paths))
    return len(paths)
