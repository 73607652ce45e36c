"""Eyecandies -> MVTec-layout conversion.

Reimplements utils/preprocessing_eyecandies.py: depth png (uint16, min/max
normalisation metadata in yaml) + camera pose -> organized point cloud via
inverse camera projection, rotation-based background stripping, written as
MVTec-style ``<class>/<split>/<defect>/{rgb,xyz,gt}`` trees.  The reference's
per-pixel Python loops (:47-51, :77-83) are vectorised.
"""

from __future__ import annotations

import os
from pathlib import Path
from shutil import copyfile
from typing import Optional

import numpy as np

from cmdiad_tpu.data import tiffio
from cmdiad_tpu.utils.logging import get_logger

log = get_logger(__name__)

FOCAL_LENGTH = 711.11


def load_depth(depth_png: str, info_yaml: str) -> np.ndarray:
    import yaml
    import imageio.v3 as iio
    with open(info_yaml) as f:
        info = yaml.safe_load(f)
    mind = info["normalization"]["min"]
    maxd = info["normalization"]["max"]
    dimg = iio.imread(depth_png).astype(np.float32)
    return dimg / 65535.0 * (maxd - mind) + mind


def depth_to_pointcloud(depth_png: str, info_yaml: str, pose_txt: str,
                        focal_length: float = FOCAL_LENGTH) -> np.ndarray:
    """(H*W, 3) point cloud from a depth image + camera pose (vectorised)."""
    depth = load_depth(depth_png, info_yaml)
    pose = np.loadtxt(pose_txt)
    h, w = depth.shape[:2]
    intrinsics = np.array([[focal_length, 0, w / 2, 0],
                           [0, focal_length, h / 2, 0],
                           [0, 0, 1, 0],
                           [0, 0, 0, 1]])
    camera_proj = intrinsics @ pose
    jj, ii = np.mgrid[0:h, 0:w]
    vecs = np.stack([ii.ravel(), jj.ravel(), np.ones(h * w),
                     1.0 / depth.ravel()], axis=0)          # (4, HW)
    hom = np.linalg.inv(camera_proj) @ vecs                 # (4, HW)
    pcd = depth.reshape(-1, 1) * hom.T
    return pcd[:, :3]


def remove_background(pc: np.ndarray) -> np.ndarray:
    """Rotation-aligned background strip (reference :62-89, vectorised)."""
    dz = pc[256, 1] - pc[-256, 1]
    dy = pc[256, 2] - pc[-256, 2]
    norm = float(np.sqrt(dz ** 2 + dy ** 2))
    start = np.array([0.0, pc[-256, 1], pc[-256, 2]])
    cos_t, sin_t = dy / norm, dz / norm
    rot = np.array([[1, 0, 0], [0, cos_t, -sin_t], [0, sin_t, cos_t]])
    p = (rot @ (pc - start).T).T
    bg = (p[:, 1] > -0.02) | (p[:, 2] > 1.8) | (p[:, 0] > 1) | (p[:, 0] < -1)
    p[bg] = -start
    p = (rot.T @ p.T).T + start
    p = p[:, [0, 2, 1]]
    return p * np.array([0.1, -0.1, 0.1])


def convert_sample(data_dir: Path, stem: str, out_xyz: Path,
                   size: int = 512) -> np.ndarray:
    pc = depth_to_pointcloud(str(data_dir / f"{stem}_depth.png"),
                             str(data_dir / f"{stem}_info_depth.yaml"),
                             str(data_dir / f"{stem}_pose.txt"))
    pc = remove_background(pc).reshape(size, size, 3).astype(np.float32)
    tiffio.imwrite(str(out_xyz), pc)
    return pc


def convert_dataset(dataset_path: str, target_dir: str) -> None:
    """Full Eyecandies conversion (reference __main__ :92-187)."""
    import cv2
    src = Path(dataset_path)
    dst = Path(target_dir)
    for category in sorted(os.listdir(src)):
        log.info("category %s", category)
        train_dir = src / category / "train" / "data"
        test_dir = src / category / "test_public" / "data"
        for split, defect in (("train", "good"), ("test", "good"),
                              ("test", "bad")):
            for sub in ("rgb", "xyz") + (("gt",) if split == "test" else ()):
                os.makedirs(dst / category / split / defect / sub,
                            exist_ok=True)

        n_train = len(os.listdir(train_dir)) // 17
        for i in range(n_train):
            stem = str(i).zfill(3)
            out = dst / category / "train" / "good"
            convert_sample(train_dir, stem, out / "xyz" / f"{stem}.tiff")
            copyfile(train_dir / f"{stem}_image_4.png",
                     out / "rgb" / f"{stem}.png")

        n_test = len(os.listdir(test_dir)) // 17
        for i in range(n_test):
            stem2, stem3 = str(i).zfill(2), str(i).zfill(3)
            mask = cv2.imread(str(test_dir / f"{stem2}_mask.png"))
            defect = "bad" if np.any(mask) else "good"
            out = dst / category / "test" / defect
            convert_sample(test_dir, stem2, out / "xyz" / f"{stem3}.tiff")
            cv2.imwrite(str(out / "gt" / f"{stem3}.png"), mask)
            copyfile(test_dir / f"{stem2}_image_4.png",
                     out / "rgb" / f"{stem3}.png")
