"""Per-class fit/evaluate orchestration.

Reimplements ``cmdiad_runner.CMDIAD`` (cmdiad_runner.py:9-98): two passes
over the train split (memory-bank building, then OCSVM late-fusion
calibration) and a prediction pass over the test split, with metric
aggregation.  The reference's off-by-one sample cap (Q8: breaks at
``flag > max_sample`` = 501 samples) becomes an exact ``max_samples`` limit.

Multi-class orchestration (``run_detection``) improves on the reference's
serial per-class loop (main.py:22-32), which rebuilds the whole model per
class:

  * ONE DualBackbone + params + fusion net is shared across all classes, so
    every jitted program traces once for the whole run instead of once per
    class (jits are keyed on the backbone/fusion instances);
  * while class N runs on the device, class N+1's samples are decoded on a
    background thread (``preload_next_class``) — the per-class host IO
    pipeline rides under device compute.
"""

from __future__ import annotations

import threading
import time
from typing import Callable, Dict, List, Optional

import numpy as np

from cmdiad_tpu.config import Config
from cmdiad_tpu.data.loader import iter_samples, stack_batches
from cmdiad_tpu.data.mvtec3d import MVTec3DDataset
from cmdiad_tpu.methods import build_method
from cmdiad_tpu.utils.logging import get_logger

log = get_logger(__name__)


class CMDIADRunner:
    def __init__(self, cfg: Config, backbone=None, params=None,
                 fusion=None, fusion_vars=None):
        self.cfg = cfg.validate()
        self.method = build_method(cfg, backbone=backbone, params=params,
                                   fusion=fusion, fusion_vars=fusion_vars)
        self.timings: Dict[str, float] = {}

    def _dataset(self, split: str, class_name: str) -> MVTec3DDataset:
        return MVTec3DDataset(
            self.cfg.dataset_path, class_name, split,
            rgb_size=self.cfg.rgb_size, xyz_size=self.cfg.xyz_size,
            gt_size=self.cfg.gt_size)

    def _train_split(self) -> str:
        return ("train_validation" if self.cfg.train_with_validation
                else "train")

    def _samples(self, split: str, class_name: str,
                 preloaded: Optional[List[dict]], max_samples=None):
        if preloaded is not None:
            return iter(preloaded if max_samples is None
                        else preloaded[:max_samples])
        return iter_samples(self._dataset(split, class_name),
                            max_samples=max_samples)

    def _bank_cache_path(self, class_name: str) -> Optional[str]:
        if not self.cfg.bank_cache_dir:
            return None
        import os
        os.makedirs(self.cfg.bank_cache_dir, exist_ok=True)
        return os.path.join(self.cfg.bank_cache_dir, f"{class_name}.npz")

    def fit(self, class_name: str,
            train_samples: Optional[List[dict]] = None) -> None:
        """Bank pass + coreset + OCSVM-calibration pass.

        ``train_samples``: optional pre-decoded sample list (from
        ``preload_class_samples``) replacing dataset IO.

        With ``cfg.bank_cache_dir`` set, a previously fitted class is
        served straight from its persisted state (banks + stats + fusers)
        and the whole fit is skipped; a fresh fit is persisted for the
        next run.  A cache whose config fingerprint does not match the
        current run (e.g. a different ``n_reweight`` or ``f_coreset``) is
        rejected and refit — stale state is never served silently.
        """
        import os
        from cmdiad_tpu.methods.base import StateFingerprintMismatch
        cache = self._bank_cache_path(class_name)
        if cache and os.path.exists(cache):
            t0 = time.perf_counter()
            try:
                self.method.load_state(cache)
                self.timings["bank_load_s"] = time.perf_counter() - t0
                log.info("class %s: fitted state loaded from %s in %.1fs "
                         "(fit skipped)", class_name, cache,
                         self.timings["bank_load_s"])
                return
            except StateFingerprintMismatch as e:
                log.warning("class %s: %s", class_name, e)
            except Exception as e:
                # an unreadable cache (truncated npz from a killed run,
                # missing array, zip corruption) must trigger the refit
                # path, never a permanent crash on every subsequent run —
                # the fresh fit below overwrites it atomically
                log.warning("class %s: unreadable fitted-state cache %s "
                            "(%s: %s); refitting", class_name, cache,
                            type(e).__name__, e)
        split = self._train_split()
        bs = max(self.cfg.batch_size, 1)
        t0 = time.perf_counter()
        n = 0
        for batch in stack_batches(
                self._samples(split, class_name, train_samples,
                              self.cfg.max_sample), bs):
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
                    self._samples(split, class_name, train_samples,
                                  self.cfg.max_sample), bs):
                self.method.add_batch_to_late_fusion_mem_bank(batch)
            self.method.run_late_fusion()
        self.timings["late_fusion_s"] = time.perf_counter() - t0
        if cache:
            self.method.save_state(cache)
            log.info("class %s: fitted state persisted to %s",
                     class_name, cache)

    def evaluate(self, class_name: str,
                 test_samples: Optional[List[dict]] = None) -> Dict[str, float]:
        bs = max(self.cfg.batch_size, 1)
        t0 = time.perf_counter()
        n = 0
        for batch in stack_batches(
                self._samples("test", class_name, test_samples), bs):
            self.method.predict_batch(batch)
            n += batch["_n"]
        # materialise the deferred (async-dispatched) predictions inside the
        # timed region — eval_images_per_s includes the device work + D2H
        if hasattr(self.method, "flush_predictions"):
            self.method.flush_predictions()
        self.timings["eval_s"] = time.perf_counter() - t0
        self.timings["eval_images_per_s"] = n / max(self.timings["eval_s"], 1e-9)
        metrics = self.method.calculate_metrics()
        log.info("class %s: %s (%.2f img/s)", class_name,
                 {k: round(v, 3) for k, v in metrics.items()},
                 self.timings["eval_images_per_s"])
        return metrics


def preload_class_samples(cfg: Config, class_name: str) -> Dict[str, List[dict]]:
    """Decode one class's train+test samples into memory (host RAM:
    ~1 MB/sample at 224²; the train split is capped at ``max_sample``)."""
    split = "train_validation" if cfg.train_with_validation else "train"
    out = {}
    for key, sp, cap in (("train", split, cfg.max_sample), ("test", "test", None)):
        ds = MVTec3DDataset(cfg.dataset_path, class_name, sp,
                            rgb_size=cfg.rgb_size, xyz_size=cfg.xyz_size,
                            gt_size=cfg.gt_size)
        out[key] = list(iter_samples(ds, max_samples=cap))
    return out


def run_detection(cfg: Config, classes: List[str],
                  backbone=None, params=None, fusion=None, fusion_vars=None,
                  on_class_done: Optional[Callable] = None,
                  ) -> Dict[str, Dict[str, float]]:
    """Run fit+evaluate over ``classes`` with shared compiled state and
    cross-class IO pipelining.  Returns {class: metrics}."""
    from cmdiad_tpu.methods import registry as _reg

    cfg = cfg.validate()
    if backbone is None:
        backbone = _reg.build_backbone(cfg)
    if params is None:
        params = _reg.load_backbone_params(cfg, backbone)
    if fusion is None:
        fusion, fusion_vars = _reg.build_fusion(cfg, backbone)

    results: Dict[str, Dict[str, float]] = {}
    pending: Optional[threading.Thread] = None
    box: Dict[str, Dict[str, List[dict]]] = {}
    errors: Dict[str, BaseException] = {}

    def _preload(cls: str):
        # a daemon thread would otherwise swallow IO errors and leave a
        # confusing KeyError at box.pop(); record and fall back to streaming
        try:
            box[cls] = preload_class_samples(cfg, cls)
        except BaseException as e:  # noqa: BLE001 — surfaced after join
            errors[cls] = e

    # Class 0 is NOT preloaded: decoding it synchronously up front would
    # serialise the whole first class's IO before any device work, whereas
    # streaming it keeps the loader's prefetch window overlapped with
    # compute (and is all a single-class run ever does).  Preloading starts
    # with class 1, under class 0's device time.
    data: Optional[Dict[str, List[dict]]] = None
    for i, cls in enumerate(classes):
        if cfg.preload_next_class and i + 1 < len(classes):
            pending = threading.Thread(
                target=_preload, args=(classes[i + 1],), daemon=True)
            pending.start()
        runner = CMDIADRunner(cfg, backbone=backbone, params=params,
                              fusion=fusion, fusion_vars=fusion_vars)
        runner.fit(cls, train_samples=data["train"] if data else None)
        results[cls] = runner.evaluate(
            cls, test_samples=data["test"] if data else None)
        if on_class_done:
            on_class_done(cls, results[cls], runner.timings)
        if pending is not None:
            pending.join()
            pending = None
            nxt = classes[i + 1]
            if nxt in errors:
                log.warning("preload of %r failed (%s); streaming it",
                            nxt, errors.pop(nxt))
                data = None
            else:
                data = box.pop(nxt)
        else:
            data = None
    return results
