"""MVTec 3D-AD dataset IO (host side).

Reimplements the reference's data layer (``dataset.py``): the on-disk layout
``<root>/<class>/<split>/<defect>/{rgb,xyz,gt}/*``, with

  * RGB: PIL bicubic resize to 224², ToTensor, ImageNet normalisation
    (dataset.py:62-65) — PIL is kept for the resize so the antialiased
    bicubic matches the reference bit-for-bit; normalisation is numpy;
  * organized PC: tiff -> (H, W, 3) float32, torch-'nearest' resize to 224²
    (mvtec3d_util.py:14-22 semantics via ops.pooling.nearest_resize_np);
  * depth: z-channel replicated to 3 channels, same nearest resize;
  * GT: PIL NEAREST resize + binarise >0.5 (dataset.py:238-241); 'good'
    samples get an all-zero mask.

Samples are numpy dicts (channels-last) ready for device upload; batching /
prefetch lives in data.loader.
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import numpy as np

from cmdiad_tpu.data import tiffio
from cmdiad_tpu.ops.pooling import nearest_resize_np as _nearest_np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def nearest_resize_np(a: np.ndarray, size):
    """torch-nearest resize; C++ fast path for float32 HWC (loader hot path)."""
    if (isinstance(size, int) and a.ndim == 3 and a.dtype == np.float32):
        try:
            from cmdiad_tpu import native
            out = native.nearest_resize(np.ascontiguousarray(a), size, size)
            if out is not None:
                return out
        except Exception:
            pass
    return _nearest_np(a, size)


def mvtec3d_classes() -> List[str]:
    return ["bagel", "cable_gland", "carrot", "cookie", "dowel",
            "foam", "peach", "potato", "rope", "tire"]


def eyecandies_classes() -> List[str]:
    return ["CandyCane", "ChocolateCookie", "ChocolatePraline", "Confetto",
            "GummyBear", "HazelnutTruffle", "LicoriceSandwich", "Lollipop",
            "Marshmallow", "PeppermintCandy"]


def load_rgb(path: str, size: int = 224) -> np.ndarray:
    """PIL bicubic resize + ImageNet normalise -> (size, size, 3) float32."""
    from PIL import Image
    img = Image.open(path).convert("RGB").resize((size, size), Image.BICUBIC)
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - IMAGENET_MEAN) / IMAGENET_STD


def load_organized_pc(path: str, size: int = 224) -> np.ndarray:
    """tiff organized pc -> nearest-resized (size, size, 3) float32."""
    pc = np.asarray(tiffio.imread(path), np.float32)
    if pc.ndim == 2:
        pc = np.repeat(pc[:, :, None], 3, axis=2)
    return np.ascontiguousarray(nearest_resize_np(pc, size))


def load_depth3(path_or_pc, size: int = 224) -> np.ndarray:
    """z-channel as 3-channel 'depth image' (dataset.py:108-109)."""
    pc = (np.asarray(tiffio.imread(path_or_pc), np.float32)
          if isinstance(path_or_pc, (str, Path)) else path_or_pc)
    depth = pc[:, :, 2]
    d3 = np.repeat(depth[:, :, None], 3, axis=2)
    return np.ascontiguousarray(nearest_resize_np(d3, size))


def load_gt(path: Optional[str], size: int = 224) -> np.ndarray:
    """(size, size) float32 binary mask; zeros when path is None ('good')."""
    if path is None:
        return np.zeros((size, size), np.float32)
    from PIL import Image
    img = Image.open(path).convert("L").resize((size, size), Image.NEAREST)
    arr = np.asarray(img, np.float32) / 255.0
    return (arr > 0.5).astype(np.float32)


@dataclasses.dataclass
class SampleRecord:
    rgb_path: str
    tiff_path: str
    gt_path: Optional[str]
    label: int


class MVTec3DDataset:
    """Path index over one class/split (reference Train/Test/TrainValidation)."""

    def __init__(self, root: str, class_name: str, split: str,
                 rgb_size: int = 224, xyz_size: int = 224, gt_size: int = 224,
                 point_capacity: int = 32768):
        self.root = Path(root)
        self.class_name = class_name
        self.split = split
        self.rgb_size, self.xyz_size, self.gt_size = rgb_size, xyz_size, gt_size
        # host-precompact valid points in the loader threads (see
        # ops.masked.host_compact_points); 0 disables
        self.point_capacity = (point_capacity
                               if point_capacity < xyz_size * xyz_size else 0)
        self.records = self._index()

    def _pairs(self, split_dir: Path, defect: str):
        rgb = sorted((split_dir / defect / "rgb").glob("*.png"))
        tif = sorted((split_dir / defect / "xyz").glob("*.tiff"))
        assert len(rgb) == len(tif), f"rgb/tiff mismatch in {split_dir/defect}"
        return rgb, tif

    def _index(self) -> List[SampleRecord]:
        records: List[SampleRecord] = []
        if self.split == "train_validation":
            dirs = [self.root / self.class_name / "train",
                    self.root / self.class_name / "validation"]
        else:
            dirs = [self.root / self.class_name / self.split]
        if self.split in ("train", "train_validation"):
            for d in dirs:
                rgb, tif = self._pairs(d, "good")
                records += [SampleRecord(str(r), str(t), None, 0)
                            for r, t in zip(rgb, tif)]
            return records
        # test: every defect type, 'good' has no gt
        test_dir = dirs[0]
        for defect in sorted(os.listdir(test_dir)):
            rgb, tif = self._pairs(test_dir, defect)
            if defect == "good":
                records += [SampleRecord(str(r), str(t), None, 0)
                            for r, t in zip(rgb, tif)]
            else:
                gts = sorted((test_dir / defect / "gt").glob("*.png"))
                assert len(gts) == len(rgb), "gt pairing broken"
                records += [SampleRecord(str(r), str(t), str(g), 1)
                            for r, t, g in zip(rgb, tif, gts)]
        return records

    def __len__(self) -> int:
        return len(self.records)

    def load(self, i: int) -> dict:
        rec = self.records[i]
        pc_raw = np.asarray(tiffio.imread(rec.tiff_path), np.float32)
        organized_pc = np.ascontiguousarray(
            nearest_resize_np(pc_raw, self.xyz_size))
        sample = {
            "rgb": load_rgb(rec.rgb_path, self.rgb_size),
            "organized_pc": organized_pc,
            "depth3": load_depth3(pc_raw, self.rgb_size),
            "label": rec.label,
            "rgb_path": rec.rgb_path,
        }
        if self.point_capacity:
            from cmdiad_tpu.ops.masked import host_compact_points
            sample["points_compact"] = host_compact_points(
                organized_pc, self.point_capacity)
        if self.split == "test":
            sample["gt"] = load_gt(rec.gt_path, self.gt_size)
        return sample

    def __iter__(self) -> Iterator[dict]:
        for i in range(len(self)):
            yield self.load(i)
