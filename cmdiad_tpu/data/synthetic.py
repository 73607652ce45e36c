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


def _blob_pc(rng, size: int, defect: str = "good",
             anomaly_radius=(0.05, 0.09)):
    """Organized pc (size,size,3) with zero background.

    defect: 'good' | 'dent' (local depth anomaly, gt marks it) |
    'blotch' (geometry is normal; the RGB defect is applied by
    ``_rgb_from_pc`` over the returned gt mask — exercises the RGB-only
    detection path, which depth features cannot see).
    anomaly_radius: (lo, hi) of the defect radius in units of the image
    side.  The default (0.05, 0.09) is sub-patch-sized for an 8-px ViT grid
    at size=64 — pixel metrics see it but the max-patch image score barely
    moves under random tiny backbones (measured image AUROC ~chance);
    fixtures that need image-LEVEL signal (the on-chip end-metric delta
    tests) pass ~(0.13, 0.18), which lifts image AUROC to ~0.94 on the same
    tiny config.
    """
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
    if defect in ("dent", "blotch"):
        ax, ay = rng.uniform(cx - r / 2, cx + r / 2), rng.uniform(cy - r / 2, cy + r / 2)
        ar = rng.uniform(*anomaly_radius)
        a2 = (xx - ax) ** 2 + (yy - ay) ** 2
        mask = (a2 < ar * ar) & inside
        if defect == "dent":
            z = np.where(mask, z - 0.15, z)
        gt[mask] = 1.0
    pc = np.stack([xx * 0.2, yy * 0.2, z], axis=-1).astype(np.float32)
    pc[~inside] = 0.0
    return pc, gt, inside


def _rgb_from_pc(rng, pc, inside, size, blotch_mask=None):
    img = np.zeros((size, size, 3), np.float32)
    img[inside] = np.stack([pc[inside, 2]] * 3, -1) * 255 * 1.2
    if blotch_mask is not None:
        # saturated color defect on normal geometry (RGB-path anomaly)
        img[blotch_mask > 0.5] = np.array([220.0, 30.0, 40.0])
    img += rng.uniform(0, 20, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def make_synthetic_dataset(root: str, class_names=("widget",),
                           n_train: int = 6, n_test_good: int = 2,
                           n_test_bad: int = 3, n_test_color: int = 0,
                           size: int = 64, seed: int = 0,
                           anomaly_radius=(0.05, 0.09)) -> str:
    """Write a miniature MVTec-3D-layout dataset under ``root``.

    ``n_test_bad`` depth dents + optional ``n_test_color`` color blotches
    (RGB anomaly on normal geometry, so the DINO/RGB path has a defect class
    only it can detect).  ``anomaly_radius`` — see ``_blob_pc``."""
    from PIL import Image
    rng = np.random.default_rng(seed)
    root_p = Path(root)
    for cls in class_names:
        for split, defect, n in (
                ("train", "good", n_train),
                ("validation", "good", 1),
                ("test", "good", n_test_good),
                ("test", "dent", n_test_bad),
                ("test", "blotch", n_test_color)):
            if n <= 0:
                continue
            anomalous = defect != "good"
            base = root_p / cls / split / defect
            for sub in ("rgb", "xyz") + (("gt",) if anomalous else ()):
                os.makedirs(base / sub, exist_ok=True)
            for i in range(n):
                pc, gt, inside = _blob_pc(rng, size, defect,
                                          anomaly_radius=anomaly_radius)
                rgb = _rgb_from_pc(rng, pc, inside, size,
                                   blotch_mask=gt if defect == "blotch"
                                   else None)
                stem = f"{i:03d}"
                Image.fromarray(rgb).save(base / "rgb" / f"{stem}.png")
                tiffio.imwrite(str(base / "xyz" / f"{stem}.tiff"), pc)
                if anomalous:
                    Image.fromarray((gt * 255).astype(np.uint8)).save(
                        base / "gt" / f"{stem}.png")
    return str(root_p)
