"""Synthetic MVTec-3D-style fixture datasets.

Generates a miniature on-disk dataset with the exact MVTec 3D-AD layout
(class/split/defect/{rgb,xyz,gt}) so the full pipeline — tiff decode, resize,
masking, banks, metrics, MTFI training — can run end-to-end in tests and
benchmarks without the real dataset (SURVEY.md §4 recommendation (d)).

Objects are smooth random blobs on a zeroed background (mimicking
plane-removed organized point clouds); anomalies are local depth dents with
matching ground-truth masks.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from cmdiad_tpu.data import tiffio


def _blob_pc(rng, size: int, dent: bool = False):
    """Organized pc (size,size,3) with zero background + optional dent mask."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    cx, cy = rng.uniform(0.4, 0.6, 2)
    r = rng.uniform(0.25, 0.35)
    d2 = (xx - cx) ** 2 + (yy - cy) ** 2
    inside = d2 < r * r
    z = 0.4 + 0.2 * np.sqrt(np.maximum(r * r - d2, 0.0)) / r
    z += 0.01 * np.sin(xx * 20) * np.cos(yy * 17)
    # per-sample high-frequency texture: keeps patch vectors distinct so
    # memory-bank distances don't collapse to exact duplicates
    z += rng.normal(0.0, 0.004, z.shape).astype(np.float32)
    gt = np.zeros((size, size), np.float32)
    if dent:
        ax, ay = rng.uniform(cx - r / 2, cx + r / 2), rng.uniform(cy - r / 2, cy + r / 2)
        ar = rng.uniform(0.04, 0.08)
        a2 = (xx - ax) ** 2 + (yy - ay) ** 2
        dent_mask = (a2 < ar * ar) & inside
        z = np.where(dent_mask, z - 0.15, z)
        gt[dent_mask] = 1.0
    pc = np.stack([xx * 0.2, yy * 0.2, z], axis=-1).astype(np.float32)
    pc[~inside] = 0.0
    return pc, gt, inside


def _rgb_from_pc(rng, pc, inside, size):
    img = np.zeros((size, size, 3), np.float32)
    img[inside] = np.stack([pc[inside, 2]] * 3, -1) * 255 * 1.2
    img += rng.uniform(0, 20, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def make_synthetic_dataset(root: str, class_names=("widget",),
                           n_train: int = 6, n_test_good: int = 2,
                           n_test_bad: int = 3, size: int = 64,
                           seed: int = 0) -> str:
    """Write a miniature MVTec-3D-layout dataset under ``root``."""
    from PIL import Image
    rng = np.random.default_rng(seed)
    root_p = Path(root)
    for cls in class_names:
        for split, defect, n, dent in (
                ("train", "good", n_train, False),
                ("validation", "good", 1, False),
                ("test", "good", n_test_good, False),
                ("test", "dent", n_test_bad, True)):
            base = root_p / cls / split / defect
            for sub in ("rgb", "xyz") + (("gt",) if dent else ()):
                os.makedirs(base / sub, exist_ok=True)
            for i in range(n):
                pc, gt, inside = _blob_pc(rng, size, dent)
                rgb = _rgb_from_pc(rng, pc, inside, size)
                stem = f"{i:03d}"
                Image.fromarray(rgb).save(base / "rgb" / f"{stem}.png")
                tiffio.imwrite(str(base / "xyz" / f"{stem}.tiff"), pc)
                if dent:
                    Image.fromarray((gt * 255).astype(np.uint8)).save(
                        base / "gt" / f"{stem}.png")
    return str(root_p)
