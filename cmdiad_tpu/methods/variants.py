"""The six anomaly-detection method variants.

Mirrors feature_extractors/multiple_features.py (see SURVEY.md §2.2):

  RGBMethod       RGBFeatures (:28)             DINO
  DepthMethod     DepthFeatures (:124)          depth-map bank (Depth)
  PointMethod     PointFeatures (:207)          Point_MAE
  DoubleMethod    DoubleRGBPointFeatures (:800) DINO+Point_MAE + MTFI dumper
  HallucinationMethod          RGBorXYZWithOneHallucination (:312)
                               FtoF (use_hn/use_hn_conv) and ItoF (use_hrnet)
  HallucinationFromFeatureMethod RGBorXYZWithOneHallucinationFromFeature (:576)
                               FtoI: hallucinate the *raw input* of the
                               missing modality and re-encode it

Known reference bugs intentionally NOT replicated (SURVEY.md quirks):
  Q2 — FtoI rgb-main double-scoring (multiple_features.py:722-741 appends
       every prediction twice); we score once.
  Q5 — use_uff calls a method that does not exist; rejected at config time.
Quirk Q1 (cross-wired bank statistics) IS replicated (see methods.base).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from cmdiad_tpu.data.feature_store import FeatureStore
from cmdiad_tpu.methods.base import MemoryBankMethod
from cmdiad_tpu.ops.masked import nonzero_point_mask


class BatchedScoresMixin:
    """Single-dispatch batched bank/score paths for the plain methods.

    ``_batch_modalities`` lists (bank_name, feature_key, s_lambda,
    smap_lambda) per modality; feature extraction and scoring then run once
    per batch instead of once per sample (big win behind the remote tunnel,
    whose per-dispatch RPC dwarfs device time).  Tail padding from
    loader.stack_batches is sliced away with the batch's ``_n``.
    """

    #: backbone `images=` input at eval time ("depth3" for DepthMethod)
    rgb_input_key = "rgb"

    def _batch_modalities(self):
        raise NotImplementedError

    def _batch_extract(self, batch):
        return self.extract(batch)

    def _fused_eval_ready(self) -> bool:
        """The single-dispatch fused eval program applies on the plain
        single-device path (one shared gate, methods.base)."""
        return self._fused_single_device_ready()

    def _fused_fn(self):
        """(predict program, modalities) from the module-level cache."""
        from cmdiad_tpu.methods.base import _fused_eval_fn
        mods = self._batch_modalities()
        return _fused_eval_fn(
            self.backbone, self.rgb_input_key,
            tuple((key, ls, lm) for _, key, ls, lm in mods),
            self.cfg.gt_size, self.cfg.dist_method_s, self.cfg.n_reweight,
            self._chunk(), self.cfg.quantized_blur), mods

    def _fused_dp_fn(self, batch):
        """(DP predict program, modalities) when the whole predict chain can
        run as ONE shard_map program over the data-parallel eval mesh
        (cfg.mesh_shape, loader-padded batch divisible by the 'data' axis);
        None otherwise.  Replaces ~5 staged dispatches per batch (sharded
        extract, per-bank sharded scoring, λ-stack, OCSVM fuse) with one."""
        mesh = self._dp_fused_mesh(batch)
        if mesh is None:
            return None, None
        from cmdiad_tpu.methods.base import _fused_eval_dp_fn
        mods = self._batch_modalities()
        return _fused_eval_dp_fn(
            mesh, self.backbone, self.rgb_input_key,
            tuple((key, ls, lm) for _, key, ls, lm in mods),
            self.cfg.gt_size, self.cfg.dist_method_s, self.cfg.n_reweight,
            self._chunk(), self.cfg.quantized_blur), mods

    def _fused_shard_bank_fn(self, batch):
        """(whole-chain fused predict program, modalities) for ROW-SHARDED
        banks (cfg.shard_bank on a multi-device mesh), or (None, None).

        VERDICT r4 #8: the staged sharded path keeps ~5 dispatches/batch in
        the biggest-bank regime because ``_fused_single_device_ready``
        excludes shard_bank.  This program folds the whole chain into ONE
        jitted dispatch: extraction under a nested shard_map (batch-sharded
        over 'data' when the loader-padded batch divides the mesh, else
        replicated — either way the Mosaic kernels run in manual mode, never
        under GSPMD's missing custom-call partitioning), then per-bank
        shard_map'd (min, argmin) over the local bank shard
        (parallel/eval._sharded_min_fn) with the eq.7/upsample/blur tail,
        λ-stack and OCSVM fusion in GSPMD-land.  cos_dist keeps the staged
        path (PAD_VALUE rows are only value-far under l2/l1 — same gate as
        ``_sharded_scoring``).  Parity vs the staged chain is tested on the
        8-device CPU mesh (tests/test_parallel.py)."""
        c = self.cfg
        if not (c.fused_eval and c.shard_bank and len(jax.devices()) > 1
                and c.dist_method_s != "cos_dist"):
            return None, None
        from cmdiad_tpu.methods.base import _build_fused_shard_bank_body
        from cmdiad_tpu.parallel.eval import (_sharded_min_fn,
                                              _use_scoring_kernel)
        mesh = self._get_mesh()
        mods = self._batch_modalities()
        n_dev = mesh.shape["data"]
        # mirror _device_batch's key filter/batching WITHOUT uploading (the
        # real upload happens once, in predict_batch)
        dev = {}
        for k, batched_ndim in (("rgb", 4), ("organized_pc", 4),
                                ("depth3", 4), ("points_compact", 3)):
            if k not in batch or (self.needed_keys is not None
                                  and k not in self.needed_keys):
                continue
            v = np.asarray(batch[k])
            shape = v.shape if v.ndim == batched_ndim else (1,) + v.shape
            dev[k] = jax.ShapeDtypeStruct(shape, v.dtype)
        b = next(v.shape[0] for v in dev.values())
        dp = b % n_dev == 0
        key = (id(mesh), tuple(sorted((k, v.shape) for k, v in dev.items())),
               tuple(tuple(m) for m in mods), dp,
               tuple(self.banks[bn].shape for bn, _, _, _ in mods))
        cache = getattr(self, "_fused_sb_cache", None)
        if cache is None:
            cache = self._fused_sb_cache = {}
        fn = cache.get(key)
        if fn is None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            backbone, rgb_key = self.backbone, self.rgb_input_key
            min_fns = tuple(
                _sharded_min_fn(mesh, True, c.dist_method_s,
                                _use_scoring_kernel(
                                    self.banks[bn].shape[0] // n_dev,
                                    c.dist_method_s))
                for bn, _, _, _ in mods)

            def extract(params, d):
                return backbone.extract(
                    params, images=d.get(rgb_key),
                    organized_pc=d.get("organized_pc"),
                    compact_pts=d.get("points_compact"))

            lead = ("data",) if dp else (None,)
            pspec = jax.tree.map(lambda _: P(), self.params)
            dspec = {k: P(*lead, *([None] * (v.ndim - 1)))
                     for k, v in dev.items()}
            out_specs = jax.tree.map(
                lambda _: P(*lead),
                jax.eval_shape(extract, self.params, dev))
            extract_fn = shard_map(extract, mesh=mesh,
                                   in_specs=(pspec, dspec),
                                   out_specs=out_specs, check_vma=False)
            body = _build_fused_shard_bank_body(
                extract_fn, rgb_key,
                tuple((k2, ls, lm) for _, k2, ls, lm in mods),
                min_fns, c.gt_size, c.dist_method_s, c.n_reweight,
                c.quantized_blur)
            fn = cache[key] = jax.jit(body)
        return fn, mods

    def _fused_scores(self, patch_list, mods):
        """λ-stacked scoring of extracted patches as ONE program — shared
        verbatim with run_late_fusion_from_cache so calibration rows are
        bit-identical whether features are recomputed or served from the
        pass-1 cache (equality-tested)."""
        from cmdiad_tpu.methods.base import _fused_scores_fn
        fn = _fused_scores_fn(
            tuple((ls, lm) for _, _, ls, lm in mods),
            self.cfg.gt_size, self.cfg.dist_method_s, self.cfg.n_reweight,
            self._chunk(), self.cfg.quantized_blur)
        return fn(tuple(patch_list), self._fused_bank_args(mods))

    def _fused_bank_args(self, mods):
        # cached per bank-name tuple (methods.base): fixed after fit, and
        # fresh per-batch device scalars would be 3 transfer RPCs per bank
        return self._bank_args_for(bn for bn, _, _, _ in mods)

    def add_batch_to_mem_bank(self, batch, class_name=None):
        self.class_name = class_name
        n = batch["_n"]
        if self._fused_eval_ready() and self._batch_is_full(batch):
            # extraction + per-bank flatten/stats as ONE program
            # (methods.base._fused_bank_pass_fn); the padded tail batch
            # takes the staged path below instead of re-tracing extraction
            from cmdiad_tpu.methods.base import _fused_bank_pass_fn
            stats_only = self._stats_only_banks()
            mods = self._batch_modalities()
            flat = [(bn, key) for bn, key, _, _ in mods
                    if bn not in stats_only]
            stats = [(bn, key) for bn, key, _, _ in mods if bn in stats_only]
            fn = _fused_bank_pass_fn(
                self.backbone, self.rgb_input_key,
                tuple(k for _, k in flat), tuple(k for _, k in stats))
            flats, sums = fn(self.params, self._device_batch(batch), None)
            for (bn, _), rows in zip(flat, flats):
                self._bank_acc[bn].append(rows)
            for (bn, _), part in zip(stats, sums):
                self._stats_acc.setdefault(bn, []).append(part)
            return
        out = self._batch_extract(batch)
        for bank_name, key, _, _ in self._batch_modalities():
            feats = out[key]
            if n != feats.shape[0]:  # slice only the padded tail batch
                feats = feats[:n]
            self._append(bank_name, feats)   # stays on device

    def _scores_batch(self, batch):
        """-> (s_vec (B, k), maps (B, k, gt, gt)) DEVICE arrays — the whole
        batched eval path is async (readback deferred to the bulk flush,
        methods.base) and the λ-weight/stack tail is ONE jitted dispatch.
        On the single-device path the per-bank scoring + λ-stack further
        collapse into the shared ``_fused_scores_fn`` program (the same one
        the cache_train_features path runs, keeping calibration rows
        bit-identical between recompute and cache)."""
        out = self._batch_extract(batch)
        mods = self._batch_modalities()
        if self._fused_eval_ready():
            return self._fused_scores([out[key] for _, key, _, _ in mods],
                                      mods)
        cols = [self.score_patch_batch(out[key], bank_name)
                for bank_name, key, _, _ in mods]
        return self._weight_stack(
            [c[0] for c in cols], [c[1] for c in cols],
            tuple(m[2] for m in mods), tuple(m[3] for m in mods))

    def add_batch_to_late_fusion_mem_bank(self, batch):
        # extraction program + ONE scoring/λ-stack program when fused (3
        # dispatches instead of 5; scoring is NOT folded into extraction so
        # the rows stay bit-identical to the cache_train_features path) —
        # the gate lives inside _scores_batch
        s_vec, maps = self._scores_batch(batch)
        self._push_late_fusion_batch(s_vec, maps, batch["_n"])

    def predict_batch(self, batch):
        n = batch["_n"]
        fn, mods = (self._fused_fn() if self._fused_eval_ready()
                    else self._fused_dp_fn(batch))
        if fn is None:  # row-sharded banks get their own whole-chain program
            fn, mods = self._fused_shard_bank_fn(batch)
        if fn is not None:
            # extraction + scoring + λ-stack + OCSVM fusion as ONE program
            # (methods.base._fused_eval_fn, its shard_map DP variant, or the
            # row-sharded-bank variant): ~5 fewer dispatch RPCs per batch
            # behind the remote relay; same ops, rounding-level equal.
            s, fused = fn(self.params, self._device_batch(batch),
                          self._fused_bank_args(mods),
                          *self._fuser_weights())
            self._record_prediction_fused(s, fused, batch["gt"][:n],
                                          batch["label"][:n],
                                          batch["rgb_path"][:n])
            return
        s_vec, maps = self._scores_batch(batch)
        self._record_prediction_batch(s_vec, maps, batch["gt"][:n],
                                      batch["label"][:n],
                                      batch["rgb_path"][:n])

    # ---- cached late fusion (cfg.cache_train_features) ---------------------
    def supports_cached_late_fusion(self) -> bool:
        return getattr(self, "_train_cache", None) is not None

    def run_late_fusion_from_cache(self, batch_size: int = 8):
        """OCSVM-calibration pass straight from the pass-1 feature cache —
        no dataset IO, no backbone re-extraction (scores are identical to
        the re-extraction path because queries are normalised from the same
        stored stats)."""
        mods = self._batch_modalities()
        # tokens per sample: rgb_patch is the ViT grid, xyz_patch the 56² splat
        g = self.backbone.vit_config.grid
        tokens = {"rgb_patch": g * g, "xyz_patch": 56 * 56}
        first_key = mods[0][1]
        n_samples = (self._train_cache[mods[0][0]].shape[0]
                     // tokens[first_key])

        fused = self._fused_eval_ready()
        for start in range(0, n_samples, batch_size):
            stop = min(start + batch_size, n_samples)
            patch_list = []
            for bank_name, key, _, _ in mods:
                t = tokens[key]
                feats = self._train_cache[bank_name][start * t: stop * t]
                patch_list.append(
                    jnp.asarray(feats).reshape(stop - start, t, -1))
            if fused:  # same program as the recompute calibration pass
                s_vec, maps = self._fused_scores(patch_list, mods)
            else:
                cols = [self.score_patch_batch(p, bn)
                        for p, (bn, _, _, _) in zip(patch_list, mods)]
                s_vec, maps = self._weight_stack(
                    [c[0] for c in cols], [c[1] for c in cols],
                    tuple(m[2] for m in mods), tuple(m[3] for m in mods))
            self._push_late_fusion_batch(s_vec, maps, stop - start)
        self._train_cache = None
        self.run_late_fusion()


class RGBMethod(BatchedScoresMixin, MemoryBankMethod):
    bank_names = ("rgb",)
    needed_keys = ("rgb",)   # never run the point backbone

    def _batch_modalities(self):
        c = self.cfg
        return [("rgb", "rgb_patch", c.rgb_s_lambda, c.rgb_smap_lambda)]

    def add_sample_to_mem_bank(self, sample, class_name=None):
        self.class_name = class_name
        out = self.extract(sample)
        self._append("rgb", out["rgb_patch"])

    def run_coreset(self):
        self._finalize_banks(norm_names=("rgb",), coreset_names=("rgb",))

    def _scores(self, sample):
        out = self.extract(sample)
        s, s_map = self.score_patch(out["rgb_patch"], "rgb")
        lam_s, lam_m = self.cfg.rgb_s_lambda, self.cfg.rgb_smap_lambda
        return np.array([lam_s * float(s)]), np.asarray(s_map)[None] * lam_m

    def add_sample_to_late_fusion_mem_bank(self, sample):
        self._push_late_fusion(*self._scores(sample))

    def predict(self, sample, mask, label, rgb_path):
        s_vec, s_maps = self._scores(sample)
        self._record_prediction(s_vec, s_maps, mask, label, rgb_path)


class DepthMethod(RGBMethod):
    """RGB pipeline over the 3-channel depth map (reference DepthFeatures)."""

    needed_keys = ("depth3",)
    rgb_input_key = "depth3"

    def extract(self, sample, rgb_key="rgb", with_2828=False):
        return super().extract(sample, rgb_key="depth3", with_2828=with_2828)


class PointMethod(BatchedScoresMixin, MemoryBankMethod):
    bank_names = ("xyz",)
    needed_keys = ("organized_pc", "points_compact")   # never run the ViT

    def _batch_modalities(self):
        c = self.cfg
        return [("xyz", "xyz_patch", c.xyz_s_lambda, c.xyz_smap_lambda)]

    def add_sample_to_mem_bank(self, sample, class_name=None):
        self.class_name = class_name
        out = self.extract(sample)
        self._append("xyz", out["xyz_patch"])

    def run_coreset(self):
        self._finalize_banks(norm_names=("xyz",), coreset_names=("xyz",))

    def _scores(self, sample):
        out = self.extract(sample)
        s, s_map = self.score_patch(out["xyz_patch"], "xyz")
        lam_s, lam_m = self.cfg.xyz_s_lambda, self.cfg.xyz_smap_lambda
        return np.array([lam_s * float(s)]), np.asarray(s_map)[None] * lam_m

    def add_sample_to_late_fusion_mem_bank(self, sample):
        self._push_late_fusion(*self._scores(sample))

    def predict(self, sample, mask, label, rgb_path):
        s_vec, s_maps = self._scores(sample)
        self._record_prediction(s_vec, s_maps, mask, label, rgb_path)


class DoubleMethod(BatchedScoresMixin, MemoryBankMethod):
    """Dual rgb+xyz banks; also the MTFI feature dumper."""

    bank_names = ("xyz", "rgb")

    def _batch_modalities(self):
        c = self.cfg
        return [("xyz", "xyz_patch", c.xyz_s_lambda, c.xyz_smap_lambda),
                ("rgb", "rgb_patch", c.rgb_s_lambda, c.rgb_smap_lambda)]

    @staticmethod
    def _depth_swap(sample):
        """use_depth inference-time swap (reference multiple_features.py:
        898-899, 931-932): the *organized pc* is fed as the rgb input.
        Bank building never swaps (the swap there is commented out,
        :804-805)."""
        return {**sample, "rgb": sample["organized_pc"]}

    def _batch_extract(self, batch):
        return self.extract(batch, with_2828=bool(self._stores))

    def add_batch_to_mem_bank(self, batch, class_name=None):
        if self._stores:  # per-sample dumping needs the per-sample path
            MemoryBankMethod.add_batch_to_mem_bank(self, batch, class_name)
            return
        BatchedScoresMixin.add_batch_to_mem_bank(self, batch, class_name)

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        cfg = self.cfg
        self._stores = {}
        if cfg.save_feature_for_fusion and cfg.save_path:
            self._stores["fusion"] = FeatureStore(cfg.save_path)
        if cfg.save_frgb_xyz and cfg.save_path_frgb_xyz:
            self._stores["frgb_xyz"] = FeatureStore(cfg.save_path_frgb_xyz)
        if cfg.save_rgb_fxyz and cfg.save_path_rgb_fxyz:
            self._stores["rgb_fxyz"] = FeatureStore(cfg.save_path_rgb_fxyz)
        self._dump_ids = {"fusion": 0, "frgb_xyz": 0, "rgb_fxyz": 0}

    def _maybe_dump(self, split, sample, out):
        if not self._stores:
            return
        cls = self.class_name or "cls"
        if "fusion" in self._stores:
            i = self._dump_ids["fusion"]
            patch = np.concatenate(
                [np.asarray(out["xyz_patch"][0]),
                 np.asarray(out["rgb_patch2"][0])], axis=1)
            self._stores["fusion"].save(split, f"{cls}{i}", patch=patch)
            self._dump_ids["fusion"] += 1
        if "frgb_xyz" in self._stores:
            i = self._dump_ids["frgb_xyz"]
            self._stores["frgb_xyz"].save(
                split, f"{cls}{i}", frgb=np.asarray(out["rgb_patch2"][0]),
                xyz=np.asarray(sample["organized_pc"]))
            self._dump_ids["frgb_xyz"] += 1
        if "rgb_fxyz" in self._stores:
            i = self._dump_ids["rgb_fxyz"]
            self._stores["rgb_fxyz"].save(
                split, f"{cls}{i}", hfxyz=np.asarray(out["xyz_patch"][0]),
                lfxyz=np.asarray(out["xyz_patch_2828"][0]),
                rgb=np.asarray(sample["rgb"]))
            self._dump_ids["rgb_fxyz"] += 1

    def add_sample_to_mem_bank(self, sample, class_name=None):
        self.class_name = class_name
        out = self.extract(sample, with_2828=bool(self._stores))
        self._maybe_dump("train", sample, out)
        self._append("xyz", out["xyz_patch"])
        self._append("rgb", out["rgb_patch"])

    def run_coreset(self):
        # Q1: xyz_std/rgb_std from the rgb bank, rgb_mean from the xyz bank
        # (multiple_features.py:877-880)
        self._finalize_banks(
            norm_names=("xyz", "rgb"), coreset_names=("xyz", "rgb"),
            stats_pairs={"xyz": ("xyz", "rgb"), "rgb": ("xyz", "rgb")})

    def _scores(self, sample, out=None):
        out = out or self.extract(sample)
        s_x, m_x = self.score_patch(out["xyz_patch"], "xyz")
        s_r, m_r = self.score_patch(out["rgb_patch"], "rgb")
        c = self.cfg
        s_vec = np.array([c.xyz_s_lambda * float(s_x),
                          c.rgb_s_lambda * float(s_r)])
        s_maps = np.stack([c.xyz_smap_lambda * np.asarray(m_x),
                           c.rgb_smap_lambda * np.asarray(m_r)])
        return s_vec, s_maps

    def add_sample_to_late_fusion_mem_bank(self, sample):
        if self.cfg.use_depth:
            sample = self._depth_swap(sample)
        self._push_late_fusion(*self._scores(sample))

    def add_batch_to_late_fusion_mem_bank(self, batch):
        if self.cfg.use_depth:
            batch = self._depth_swap(batch)
        BatchedScoresMixin.add_batch_to_late_fusion_mem_bank(self, batch)

    def predict_batch(self, batch):
        if self._stores:
            MemoryBankMethod.predict_batch(self, batch)
            return
        if self.cfg.use_depth:
            batch = self._depth_swap(batch)
        BatchedScoresMixin.predict_batch(self, batch)

    def predict(self, sample, mask, label, rgb_path):
        if self.cfg.use_depth:
            sample = self._depth_swap(sample)
        out = self.extract(sample, with_2828=bool(self._stores))
        self._maybe_dump("test", sample, out)
        s_vec, s_maps = self._scores(sample, out)
        self._record_prediction(s_vec, s_maps, mask, label, rgb_path)


class HallucinationMethod(MemoryBankMethod):
    """Main-modality bank + hallucinated-feature bank (FtoF / ItoF).

    At inference only the main modality is consumed: main='rgb' reads only
    the RGB image; main='xyz' reads only the organized pc (the reference's
    MTFI promise). Bank-building uses both modalities.
    """

    bank_names = ("rgb", "xyz", "fusion")

    # ---- jitted fusion dispatchers -----------------------------------------
    # Cached at module level keyed on the (value-hashable) flax module so a
    # fresh method per class reuses the traced programs instead of re-jitting
    # (the per-class runner shares one fusion net across all 10 classes).
    _FUSION_JIT_CACHE: dict = {}

    def _fusion_apply_jit(self):
        fusion = self.fusion
        fn = self._FUSION_JIT_CACHE.get(fusion)
        if fn is None:
            import jax

            def apply(variables, feat, out_type=None):
                if out_type is None:            # HRNet / FtoI image nets
                    return fusion.apply(variables, feat)
                return fusion.apply(variables, feat, out_type,
                                    method="generate")
            fn = jax.jit(apply, static_argnums=(2,))
            self._FUSION_JIT_CACHE[fusion] = fn
        return fn

    def _hallucinate(self, sample, out):
        """-> (B, N, D) hallucinated features of the *other* modality.

        Batch-transparent: ``sample``/``out`` may hold one sample or a whole
        loader batch; every fusion net is applied once per call through a
        jitted dispatcher (no per-op eager dispatch behind the tunnel).
        """
        cfg = self.cfg
        if cfg.use_hrnet:
            img = sample["rgb"] if cfg.main_modality == "rgb" else sample["organized_pc"]
            img = jnp.asarray(np.asarray(img)[None] if np.asarray(img).ndim == 3
                              else np.asarray(img))
            grid = self._fusion_apply_jit()(self.fusion_vars, img)  # (B,56,56,D)
            return grid.reshape(grid.shape[0], -1, grid.shape[-1])
        if cfg.use_hn or cfg.use_hn_conv:
            if cfg.main_modality == "rgb":
                feat, out_type = out["rgb_patch2"], "xyz"
            else:
                feat, out_type = out["xyz_patch"], "rgb"
            return self._fusion_apply_jit()(self.fusion_vars, feat, out_type)
        raise ValueError("no fusion flavour configured")

    def _main_keys(self):
        if self.cfg.main_modality == "rgb":
            return "rgb", "rgb_patch", self.cfg.rgb_s_lambda, self.cfg.rgb_smap_lambda
        return "xyz", "xyz_patch", self.cfg.xyz_s_lambda, self.cfg.xyz_smap_lambda

    def _hall(self, sample, out):
        """Hallucinated-feature hook; the FtoI subclass swaps the source."""
        return self._hallucinate(sample, out)

    def add_sample_to_mem_bank(self, sample, class_name=None):
        self.class_name = class_name
        out = self.extract(sample)
        hall = self._hall(sample, out)
        self._bank_tokens = {"rgb": out["rgb_patch"].shape[-2],
                             "xyz": out["xyz_patch"].shape[-2],
                             "fusion": hall.shape[-2]}
        self._append("rgb", out["rgb_patch"])
        self._append("xyz", out["xyz_patch"])
        self._append("fusion", hall)

    def _stats_only_banks(self):
        # Only the main + fusion banks are ever scored; the other modality
        # exists purely to feed the cross-wired statistics, so its rows are
        # never materialised — only streamed (sum, sum², count) partials
        # (saves ~5 GB HBM and the full accumulation at 500-sample classes).
        return ("xyz",) if self.cfg.main_modality == "rgb" else ("rgb",)

    def run_coreset(self):
        main = self.cfg.main_modality
        # Q1 wiring (multiple_features.py:372-377): means from the xyz bank,
        # stds from the rgb bank, for all three stat sets.
        self._finalize_banks(
            norm_names=(main, "fusion"), coreset_names=(main, "fusion"),
            stats_pairs={"xyz": ("xyz", "rgb"), "rgb": ("xyz", "rgb"),
                         "fusion": ("xyz", "rgb")},
            place_names=(main, "fusion"))

    def _inference_extract(self, sample):
        """Extract using ONLY the main modality (true few-modal inference).

        Batch-transparent (sample or loader batch).  For the xyz main the
        loader's precompacted point set is forwarded when present — exactly
        equivalent, much cheaper FPS/KNN.
        """
        if self.cfg.main_modality == "rgb":
            return self.extract({"rgb": sample["rgb"]})
        sub = {"organized_pc": sample["organized_pc"]}
        if "points_compact" in sample:
            sub["points_compact"] = sample["points_compact"]
        return self.extract(sub)

    def _scores(self, sample):
        out = self._inference_extract(sample)
        hall = self._hall(sample, out)
        s_f, m_f = self.score_patch(hall, "fusion")
        main, key, lam_s, lam_m = self._main_keys()
        s_m, m_m = self.score_patch(out[key], main)
        c = self.cfg
        s_vec = np.array([lam_s * float(s_m), c.fusion_s_lambda * float(s_f)])
        s_maps = np.stack([lam_m * np.asarray(m_m),
                           c.fusion_smap_lambda * np.asarray(m_f)])
        return s_vec, s_maps

    def add_sample_to_late_fusion_mem_bank(self, sample):
        self._push_late_fusion(*self._scores(sample))

    def predict(self, sample, mask, label, rgb_path):
        s_vec, s_maps = self._scores(sample)
        self._record_prediction(s_vec, s_maps, mask, label, rgb_path)

    # ---- batched paths (one dispatch per batch per program, replacing the
    # per-sample fallback; mirrors BatchedScoresMixin for the MTFI methods,
    # reference predict loops multiple_features.py:312-797) ----------------
    def add_batch_to_mem_bank(self, batch, class_name=None):
        self.class_name = class_name
        n = batch["_n"]
        c = self.cfg
        if (self._fused_eval_ready() and self._batch_is_full(batch)):
            # extraction + in-program hallucination + per-bank flatten /
            # streamed stats as ONE program (5 dispatches -> 1); the padded
            # tail batch takes the staged path below (re-tracing the whole
            # extraction for one odd slice would cost a remote compile)
            from cmdiad_tpu.methods.base import _fused_bank_pass_fn
            stats_only = self._stats_only_banks()
            keymap = {"rgb": "rgb_patch", "xyz": "xyz_patch",
                      "fusion": "fusion"}
            flat = [bn for bn in self.bank_names if bn not in stats_only]
            stats = [bn for bn in self.bank_names if bn in stats_only]
            fn = _fused_bank_pass_fn(
                self.backbone, "rgb",
                tuple(keymap[bn] for bn in flat),
                tuple(keymap[bn] for bn in stats),
                hall_spec=(self.fusion,
                           "hrnet" if c.use_hrnet else "ftof",
                           c.main_modality))
            flats, sums = fn(self.params, self._device_batch(batch),
                             self.fusion_vars)
            tokens = {"rgb": self.backbone.vit_config.grid ** 2,
                      "xyz": 56 * 56}
            for bn, rows in zip(flat, flats):
                self._bank_acc[bn].append(rows)
                tokens[bn] = rows.shape[0] // n
            for bn, part in zip(stats, sums):
                self._stats_acc.setdefault(bn, []).append(part)
            self._bank_tokens = tokens
            return
        out = self.extract(batch)
        hall = self._hall(batch, out)
        self._bank_tokens = {"rgb": out["rgb_patch"].shape[-2],
                             "xyz": out["xyz_patch"].shape[-2],
                             "fusion": hall.shape[-2]}
        for name, arr in (("rgb", out["rgb_patch"]),
                          ("xyz", out["xyz_patch"]), ("fusion", hall)):
            if n != arr.shape[0]:  # slice only the padded tail batch
                arr = arr[:n]
            self._append(name, arr)   # device; non-main -> streamed stats

    def _scores_batch(self, batch):
        out = self._inference_extract(batch)
        hall = self._hall(batch, out)
        main, key, lam_s, lam_m = self._main_keys()
        if self._fused_scores_ready():
            # dual scoring + λ-stack as ONE program (applies to FtoI too,
            # whose hallucination keeps its deliberate host round-trip) —
            # the same _fused_scores_fn program the cache path runs
            return self._fused_scores([out[key], hall], main)
        s_m, m_m = self.score_patch_batch(out[key], main)
        s_f, m_f = self.score_patch_batch(hall, "fusion")
        c = self.cfg
        return self._weight_stack(
            [s_m, s_f], [m_m, m_f],
            (lam_s, c.fusion_s_lambda), (lam_m, c.fusion_smap_lambda))

    # ---- fused single-dispatch eval (mirrors BatchedScoresMixin) -----------
    def _fused_scores_ready(self) -> bool:
        """Scoring-stage fusion (dual scoring + λ-stack as one program)
        applies to every flavor on the single-device path, FtoI included
        (one shared gate, methods.base)."""
        return self._fused_single_device_ready()

    def _fused_eval_ready(self) -> bool:
        """FtoF/ItoF hallucination is pure device math, so the whole chain
        (main-modality extraction -> hallucinate -> dual scoring -> λ-stack
        -> fusion) fuses into one program.  FtoI never qualifies for the
        FULL program: its hallucinated image re-enters the other backbone
        via a deliberate host round-trip (dense-pc compaction, see
        HallucinationFromFeatureMethod._hall) — the use_hn/use_hrnet flags
        are all False there, so the gate falls through naturally (FtoI
        still gets the scoring-stage fusion via _fused_scores_ready)."""
        c = self.cfg
        return (self._fused_scores_ready()
                and (c.use_hn or c.use_hn_conv or c.use_hrnet))

    def _fused_fn(self):
        from cmdiad_tpu.methods.base import _fused_mtfi_eval_fn
        c = self.cfg
        main, _, lam_s, lam_m = self._main_keys()
        fn = _fused_mtfi_eval_fn(
            self.backbone, self.fusion,
            "hrnet" if c.use_hrnet else "ftof", c.main_modality,
            (lam_s, lam_m, c.fusion_s_lambda, c.fusion_smap_lambda),
            c.gt_size, c.dist_method_s, c.n_reweight, self._chunk(),
            c.quantized_blur)
        return fn, main

    def _fused_dp_fn(self, batch):
        """(DP predict program, main bank name) — the MTFI analogue of
        BatchedScoresMixin._fused_dp_fn: ONE shard_map program for
        extraction -> hallucination -> dual scoring -> λ-stack -> fusion
        over the cfg.mesh_shape mesh.  FtoF/ItoF only (same reason as
        _fused_eval_ready: FtoI hallucination is a host round-trip)."""
        c = self.cfg
        if not (c.use_hn or c.use_hn_conv or c.use_hrnet):
            return None, None
        mesh = self._dp_fused_mesh(batch)
        if mesh is None:
            return None, None
        from cmdiad_tpu.methods.base import _fused_mtfi_eval_dp_fn
        main, _, lam_s, lam_m = self._main_keys()
        return _fused_mtfi_eval_dp_fn(
            mesh, self.backbone, self.fusion,
            "hrnet" if c.use_hrnet else "ftof", c.main_modality,
            (lam_s, lam_m, c.fusion_s_lambda, c.fusion_smap_lambda),
            c.gt_size, c.dist_method_s, c.n_reweight, self._chunk(),
            c.quantized_blur), main

    def _fused_shard_bank_fn(self, batch):
        """(whole-chain fused MTFI predict program, main bank name) for
        ROW-SHARDED banks, or (None, None) — the MTFI analogue of
        BatchedScoresMixin._fused_shard_bank_fn: main-modality extraction +
        in-program hallucination under a nested shard_map, then per-bank
        shard_map'd min over the local bank shard with the scoring tail,
        λ-stack and OCSVM fusion in GSPMD-land, as ONE dispatch.  FtoF/ItoF
        only (FtoI's hallucinated image re-enters the other backbone via a
        deliberate host round-trip, so it keeps the staged sharded path)."""
        c = self.cfg
        if not (c.fused_eval and c.shard_bank and len(jax.devices()) > 1
                and c.dist_method_s != "cos_dist"
                and (c.use_hn or c.use_hn_conv or c.use_hrnet)):
            return None, None
        from cmdiad_tpu.methods.base import _build_fused_shard_bank_mtfi_body
        from cmdiad_tpu.parallel.eval import (_sharded_min_fn,
                                              _use_scoring_kernel)
        mesh = self._get_mesh()
        n_dev = mesh.shape["data"]
        main, main_key, lam_s, lam_m = self._main_keys()
        # shape-only mirror of _fused_inputs + _device_batch (no upload)
        key_dims = ((("rgb", 4),) if c.main_modality == "rgb"
                    else (("organized_pc", 4), ("points_compact", 3)))
        dev = {}
        for k, nd in key_dims:
            if k not in batch:
                continue
            v = np.asarray(batch[k])
            shape = v.shape if v.ndim == nd else (1,) + v.shape
            dev[k] = jax.ShapeDtypeStruct(shape, v.dtype)
        b = next(v.shape[0] for v in dev.values())
        dp = b % n_dev == 0
        key = (id(mesh), tuple(sorted((k, v.shape) for k, v in dev.items())),
               dp, tuple(self.banks[bn].shape for bn in (main, "fusion")))
        cache = getattr(self, "_fused_sb_cache", None)
        if cache is None:
            cache = self._fused_sb_cache = {}
        fn = cache.get(key)
        if fn is None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            backbone, fusion = self.backbone, self.fusion
            flavor = "hrnet" if c.use_hrnet else "ftof"
            main_modality = c.main_modality
            min_fns = tuple(
                _sharded_min_fn(mesh, True, c.dist_method_s,
                                _use_scoring_kernel(
                                    self.banks[bn].shape[0] // n_dev,
                                    c.dist_method_s))
                for bn in (main, "fusion"))

            def extract_hall(params, fusion_vars, d):
                out = backbone.extract(
                    params, images=d.get("rgb"),
                    organized_pc=d.get("organized_pc"),
                    compact_pts=d.get("points_compact"))
                if flavor == "hrnet":
                    img = (d["rgb"] if main_modality == "rgb"
                           else d["organized_pc"])
                    grid = fusion.apply(fusion_vars, img)   # (B, 56, 56, D)
                    hall = grid.reshape(grid.shape[0], -1, grid.shape[-1])
                else:
                    feat = (out["rgb_patch2"] if main_modality == "rgb"
                            else out["xyz_patch"])
                    out_type = "xyz" if main_modality == "rgb" else "rgb"
                    hall = fusion.apply(fusion_vars, feat, out_type,
                                        method="generate")
                return out[main_key], hall

            lead = ("data",) if dp else (None,)
            pspec = jax.tree.map(lambda _: P(), self.params)
            fspec = jax.tree.map(lambda _: P(), self.fusion_vars)
            dspec = {k: P(*lead, *([None] * (v.ndim - 1)))
                     for k, v in dev.items()}
            extract_fn = shard_map(extract_hall, mesh=mesh,
                                   in_specs=(pspec, fspec, dspec),
                                   out_specs=(P(*lead), P(*lead)),
                                   check_vma=False)
            body = _build_fused_shard_bank_mtfi_body(
                extract_fn,
                (lam_s, lam_m, c.fusion_s_lambda, c.fusion_smap_lambda),
                min_fns, c.gt_size, c.dist_method_s, c.n_reweight,
                c.quantized_blur)
            fn = cache[key] = jax.jit(body)
        return fn, main

    def _fused_scores(self, patch_list, main):
        """Shared scores/λ-stack program (methods.base._fused_scores_fn) —
        the SAME program scores recomputed and cache_train_features
        calibration batches, keeping their rows bit-identical."""
        from cmdiad_tpu.methods.base import _fused_scores_fn
        c = self.cfg
        _, _, lam_s, lam_m = self._main_keys()
        fn = _fused_scores_fn(
            ((lam_s, lam_m), (c.fusion_s_lambda, c.fusion_smap_lambda)),
            c.gt_size, c.dist_method_s, c.n_reweight, self._chunk(),
            c.quantized_blur)
        return fn(tuple(patch_list), self._fused_bank_args(main))

    def _fused_inputs(self, batch):
        """Main-modality sub-batch on device (same keys
        _inference_extract feeds the staged path)."""
        if self.cfg.main_modality == "rgb":
            sub = {"rgb": batch["rgb"]}
        else:
            sub = {"organized_pc": batch["organized_pc"]}
            if "points_compact" in batch:
                sub["points_compact"] = batch["points_compact"]
        return self._device_batch(sub)

    def _fused_bank_args(self, main: str):
        return self._bank_args_for((main, "fusion"))

    def add_batch_to_late_fusion_mem_bank(self, batch):
        # extraction + hallucination programs + ONE scoring/λ-stack program
        # when fused (not folded further: the scoring program is shared with
        # the cache_train_features path for bit-equal rows) — the gate lives
        # inside _scores_batch
        s_vec, maps = self._scores_batch(batch)
        self._push_late_fusion_batch(s_vec, maps, batch["_n"])

    def predict_batch(self, batch):
        n = batch["_n"]
        fn, main = (self._fused_fn() if self._fused_eval_ready()
                    else self._fused_dp_fn(batch))
        if fn is None:  # row-sharded banks get their own whole-chain program
            fn, main = self._fused_shard_bank_fn(batch)
        if fn is not None:
            s, fused = fn(self.params, self._fused_inputs(batch),
                          self.fusion_vars, self._fused_bank_args(main),
                          *self._fuser_weights())
            self._record_prediction_fused(s, fused, batch["gt"][:n],
                                          batch["label"][:n],
                                          batch["rgb_path"][:n])
            return
        s_vec, maps = self._scores_batch(batch)
        self._record_prediction_batch(s_vec, maps, batch["gt"][:n],
                                      batch["label"][:n],
                                      batch["rgb_path"][:n])

    # ---- cached late fusion (cfg.cache_train_features) ---------------------
    def supports_cached_late_fusion(self) -> bool:
        return getattr(self, "_train_cache", None) is not None

    def run_late_fusion_from_cache(self, batch_size: int = 8):
        """OCSVM-calibration pass straight from the pass-1 feature cache —
        no dataset IO, no backbone re-extraction, no re-hallucination
        (scores are identical to the re-extraction path because queries
        are normalised from the same stored stats).  Mirrors
        BatchedScoresMixin.run_late_fusion_from_cache for the MTFI banks
        (main + hallucinated-fusion; the stats-only bank is never scored)."""
        main, _, lam_s, lam_m = self._main_keys()
        c = self.cfg
        t_main = self._bank_tokens[main]
        t_fus = self._bank_tokens["fusion"]
        n_samples = self._train_cache[main].shape[0] // t_main
        # scoring-stage gate (NOT the full-program gate): must match
        # _scores_batch so cache and recompute rows stay bit-identical —
        # for FtoI too, which never qualifies for the full fused program
        fused = self._fused_scores_ready()
        for start in range(0, n_samples, batch_size):
            stop = min(start + batch_size, n_samples)
            patch_list = []
            for name, t in ((main, t_main), ("fusion", t_fus)):
                feats = self._train_cache[name][start * t: stop * t]
                patch_list.append(
                    jnp.asarray(feats).reshape(stop - start, t, -1))
            if fused:  # same program as the recompute calibration pass
                s_vec, maps = self._fused_scores(patch_list, main)
            else:
                cols = [self.score_patch_batch(p, name) for p, name in
                        zip(patch_list, (main, "fusion"))]
                s_vec, maps = self._weight_stack(
                    [cols[0][0], cols[1][0]], [cols[0][1], cols[1][1]],
                    (lam_s, c.fusion_s_lambda), (lam_m, c.fusion_smap_lambda))
            self._push_late_fusion_batch(s_vec, maps, stop - start)
        self._train_cache = None
        self.run_late_fusion()


class HallucinationFromFeatureMethod(HallucinationMethod):
    """FtoI: hallucinate the missing *raw input* and re-encode it through the
    frozen backbone of the other modality (multiple_features.py:576-797) —
    the only method where generated data re-enters a feature extractor.
    All bank/score plumbing is inherited; only the hallucination hook
    differs."""

    bank_names = ("rgb", "xyz", "fusion")

    def _hall(self, sample, out):
        cfg = self.cfg
        if cfg.main_modality == "rgb":
            # rgb features -> organized-pc image -> point backbone.  The
            # regressed pc is dense (no exact-zero background), so the
            # loader-capacity compaction would silently drop points; feed the
            # full point list as the precompacted set (exact, reference
            # re-encodes every nonzero point, multiple_features.py:591-596).
            pc_img = np.asarray(self._fusion_apply_jit()(self.fusion_vars,
                                                         out["rgb_patch2"]))
            full_pts = pc_img.reshape(pc_img.shape[0], -1, 3)
            pc_out = self.extract({"organized_pc": pc_img,
                                   "points_compact": full_pts})
            return pc_out["xyz_patch"]
        # xyz features -> rgb image -> ViT
        rgb_img = self._fusion_apply_jit()(self.fusion_vars, out["xyz_patch"])
        rgb_out = self.extract({"rgb": np.asarray(rgb_img)})
        return rgb_out["rgb_patch"]
