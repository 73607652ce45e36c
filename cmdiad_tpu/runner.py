"""Per-class fit/evaluate orchestration.

Reimplements ``cmdiad_runner.CMDIAD`` (cmdiad_runner.py:9-98): two passes
over the train split (memory-bank building, then OCSVM late-fusion
calibration) and a prediction pass over the test split, with metric
aggregation.  The reference's off-by-one sample cap (Q8: breaks at
``flag > max_sample`` = 501 samples) becomes an exact ``max_samples`` limit.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import numpy as np

from cmdiad_tpu.config import Config
from cmdiad_tpu.data.loader import iter_samples, stack_batches
from cmdiad_tpu.data.mvtec3d import MVTec3DDataset
from cmdiad_tpu.methods import build_method
from cmdiad_tpu.utils.logging import get_logger

log = get_logger(__name__)


class CMDIADRunner:
    def __init__(self, cfg: Config, backbone=None, params=None):
        self.cfg = cfg.validate()
        self.method = build_method(cfg, backbone=backbone, params=params)
        self.timings: Dict[str, float] = {}

    def _dataset(self, split: str, class_name: str) -> MVTec3DDataset:
        return MVTec3DDataset(
            self.cfg.dataset_path, class_name, split,
            rgb_size=self.cfg.rgb_size, xyz_size=self.cfg.xyz_size,
            gt_size=self.cfg.gt_size)

    def fit(self, class_name: str) -> None:
        split = ("train_validation" if self.cfg.train_with_validation
                 else "train")
        ds = self._dataset(split, class_name)
        bs = max(self.cfg.batch_size, 1)
        t0 = time.perf_counter()
        n = 0
        for batch in stack_batches(
                iter_samples(ds, max_samples=self.cfg.max_sample), bs):
            self.method.add_batch_to_mem_bank(batch, class_name=class_name)
            n += batch["_n"]
        self.timings["bank_pass_s"] = time.perf_counter() - t0
        log.info("class %s: %d samples banked in %.1fs", class_name, n,
                 self.timings["bank_pass_s"])

        t0 = time.perf_counter()
        self.method.run_coreset()
        self.timings["coreset_s"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        if getattr(self.method, "supports_cached_late_fusion",
                   lambda: False)():
            self.method.run_late_fusion_from_cache(batch_size=max(bs, 8))
        else:
            for batch in stack_batches(
                    iter_samples(ds, max_samples=self.cfg.max_sample), bs):
                self.method.add_batch_to_late_fusion_mem_bank(batch)
            self.method.run_late_fusion()
        self.timings["late_fusion_s"] = time.perf_counter() - t0

    def evaluate(self, class_name: str) -> Dict[str, float]:
        ds = self._dataset("test", class_name)
        bs = max(self.cfg.batch_size, 1)
        t0 = time.perf_counter()
        n = 0
        for batch in stack_batches(iter_samples(ds), bs):
            self.method.predict_batch(batch)
            n += batch["_n"]
        self.timings["eval_s"] = time.perf_counter() - t0
        self.timings["eval_images_per_s"] = n / max(self.timings["eval_s"], 1e-9)
        metrics = self.method.calculate_metrics()
        log.info("class %s: %s (%.2f img/s)", class_name,
                 {k: round(v, 3) for k, v in metrics.items()},
                 self.timings["eval_images_per_s"])
        return metrics
