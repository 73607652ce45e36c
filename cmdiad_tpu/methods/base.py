"""Shared memory-bank method machinery.

Reimplements the reference's ``Features`` base class
(feature_extractors/features.py:21-425) TPU-first:

  * feature extraction is the jitted DualBackbone (no per-sample host hops);
  * banks accumulate as host numpy, then live on device padded to a bucket
    size (ops.scoring.pad_bank) once coreset selection has run;
  * per-sample scoring is one jitted program per (bank bucket, feat grid):
    normalise -> chunked bank min-distance -> eq.7 reweight -> bilinear ->
    PIL-parity blur (ops.scoring.patchcore_score);
  * the OCSVM late fusion and metric bookkeeping match the reference flow
    (fit pass 2 -> s_lib/s_map_lib -> SGDOneClassSVM; predict ->
    score_samples -> AUROC/AU-PRO).

Reference quirk Q1 (cross-wired normalisation statistics in the multi-bank
methods, multiple_features.py:372-377/616-621/877-880) is replicated by
default for checkpoint parity and can be disabled with
``fix_cross_stats=True`` on the method.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from cmdiad_tpu.config import Config
from cmdiad_tpu.fusion.ocsvm import SGDOneClassSVM
from cmdiad_tpu.metrics import roc_auc_score, calculate_au_pro
from cmdiad_tpu.models.backbone import DualBackbone
from cmdiad_tpu.ops.coreset import coreset_select
from cmdiad_tpu.ops.scoring import patchcore_score, pad_bank


class StateFingerprintMismatch(ValueError):
    """Persisted fitted state was produced under a different scoring-relevant
    configuration (or an older format) than the current run — serving it
    would silently change scores (e.g. an ``nn_`` table built with a
    different ``n_reweight`` changes the eq.7 neighbourhood width)."""


# Bump whenever the persisted layout or any serving-path semantics change.
_STATE_FORMAT_VERSION = 2

# Every config field that shapes the fitted state or how it is scored:
# what went INTO the banks (dataset/backbones/ckpts/extraction dtype/sample
# cap), how they were SUBSAMPLED (coreset family), and how they are SCORED
# at serve time (distances, eq.7 k via the persisted nn_ tables, λs, blur,
# OCSVM calibration).  Placement fields (mesh_shape/shard_bank/batch_size)
# are deliberately absent: load_state re-places banks per-process.
_FINGERPRINT_FIELDS = (
    "method_name", "main_modality",
    "use_hn", "use_hn_conv", "use_hn_from_rgb_mlp", "use_hn_from_rgb_conv",
    "use_hrnet", "c_hrnet", "fusion_module_path", "use_depth",
    "rgb_backbone_name", "xyz_backbone_name", "group_size", "num_group",
    "rgb_ckpt_path", "xyz_ckpt_path",
    "dataset_type", "dataset_path",
    "rgb_size", "xyz_size", "gt_size", "max_sample", "train_with_validation",
    "f_coreset", "coreset_eps", "coreset_dtype",
    "dist_method_s", "dist_method_coreset", "random_state", "n_reweight",
    "quantized_blur",
    "xyz_s_lambda", "xyz_smap_lambda", "rgb_s_lambda", "rgb_smap_lambda",
    "fusion_s_lambda", "fusion_smap_lambda",
    "ocsvm_nu", "ocsvm_maxiter", "ocsvm_backend", "ocsvm_seg_max_rows",
    "compute_dtype", "use_pallas", "use_flash", "seed",
)


@functools.partial(jax.jit, static_argnames=("feat_hw", "out_size", "metric",
                                             "n_reweight", "chunk",
                                             "quantized_blur"))
def _score_one(patch, bank, mean, std, n_valid, nn_table, feat_hw, out_size,
               metric, n_reweight, chunk=8192, quantized_blur=False):
    normed = (patch - mean) / std
    return patchcore_score(normed, bank, feat_hw, out_size=out_size,
                           metric=metric, n_reweight=n_reweight, chunk=chunk,
                           n_valid=n_valid, quantized_blur=quantized_blur,
                           nn_table=nn_table)


@functools.partial(jax.jit, static_argnames=("feat_hw", "out_size", "metric",
                                             "n_reweight", "chunk",
                                             "quantized_blur"))
def _score_batch(patches, bank, mean, std, n_valid, nn_table, feat_hw,
                 out_size, metric, n_reweight, chunk=8192,
                 quantized_blur=False):
    """vmapped per-sample scoring: (B, Np, D) -> ((B,), (B, out, out))."""
    def one(p):
        return patchcore_score((p - mean) / std, bank, feat_hw,
                               out_size=out_size, metric=metric,
                               n_reweight=n_reweight, chunk=chunk,
                               n_valid=n_valid, quantized_blur=quantized_blur,
                               nn_table=nn_table)
    return jax.vmap(one)(patches)


@jax.jit
def _cat_mean_std(parts):
    """Concat accumulated bank chunks + element mean/std(ddof=1), fused."""
    cat = jnp.concatenate(parts, axis=0)
    return cat, jnp.mean(cat), jnp.std(cat, ddof=1)


@jax.jit
def _flatten_f32(arr):
    """(B, Np, D)/(Np, D) -> (rows, D) f32 in one dispatch."""
    return arr.astype(jnp.float32).reshape(-1, arr.shape[-1])


@jax.jit
def _sum_sumsq(arr):
    """Streaming-stats partials (sum, sum of squares) in one dispatch."""
    a = arr.astype(jnp.float32)
    return jnp.sum(a), jnp.sum(a * a)


@functools.lru_cache(maxsize=None)
def _weight_stack_fn(lam_s, lam_m):
    """Jitted λ-weight + stack tail, cached at MODULE level on the λ tuples
    so a fresh method per class (run_detection) reuses the traced program —
    behind the relay every re-trace is a multi-second remote compile."""
    @jax.jit
    def fn(ss, ms):
        s_vec = jnp.stack([jnp.float32(l) * s.astype(jnp.float32)
                           for l, s in zip(lam_s, ss)], axis=1)
        maps = jnp.stack([jnp.float32(l) * m.astype(jnp.float32)
                          for l, m in zip(lam_m, ms)], axis=1)
        return s_vec, maps
    return fn


@jax.jit
def _normalize(bank, mean, std):
    return (bank - mean) / std


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def _bank_nn_table_jit(padded, n_valid, k, metric):
    """ONE program for the per-bank NN-table build (the eager form paid a
    handful of dispatches + first-use remote compiles per bank)."""
    from cmdiad_tpu.ops.scoring import bank_nn_table
    return bank_nn_table(padded, k=k, n_valid=n_valid, metric=metric)


@jax.jit
def _gather_pad(bank, idx):
    """Coreset row gather + f32 cast + bucket pad as one program."""
    return pad_bank(bank[idx].astype(jnp.float32))


@jax.jit
def _pad_f32(bank):
    return pad_bank(bank.astype(jnp.float32))


@jax.jit
def _fuse_predict(s_vec, s_maps, wd, ws):
    """Device-side linear-OCSVM fusion (one dispatch per predict batch):
    ``score_samples`` of fusion/ocsvm.py is exactly x·coef for both fusers,
    so only the FUSED (B, gt, gt) map + (B,) scores ever cross to host."""
    s = s_vec.astype(jnp.float32) @ wd                           # (B,)
    fused = jnp.einsum("bkxy,k->bxy",
                       s_maps.astype(jnp.float32), ws)           # (B,gt,gt)
    return s, fused


def _lam_weighted_scores(entries, gt_size, metric, n_reweight, chunk,
                         quantized_blur):
    """Traced-context core shared by every fused program builder: per bank,
    normalise -> vmapped PatchCore score -> λ-weight, then stack.

    entries: iterable of (patches (B, Np, D), lam_s, lam_m,
    (bank, mean, std, n_valid, nn_table)).  Keeping this in ONE place is
    what guarantees the fused predict, the calibration scorer and the MTFI
    predict all run the identical per-bank math — a divergence here would
    silently split fused vs staged results (they are equality-/
    tolerance-tested against each other in test_e2e).
    -> (s_vec (B, k), maps (B, k, gt, gt)), both f32.
    """
    ss, ms = [], []
    for patches, lam_s, lam_m, (bank, mean, std, n_valid, nn_table) in entries:
        side = int(np.sqrt(patches.shape[1]))

        def one(p, bank=bank, mean=mean, std=std, n_valid=n_valid,
                nn_table=nn_table, side=side):
            return patchcore_score(
                (p - mean) / std, bank, (side, side), out_size=gt_size,
                metric=metric, n_reweight=n_reweight, chunk=chunk,
                n_valid=n_valid, quantized_blur=quantized_blur,
                nn_table=nn_table)

        s, m = jax.vmap(one)(patches)
        ss.append(jnp.float32(lam_s) * s.astype(jnp.float32))
        ms.append(jnp.float32(lam_m) * m.astype(jnp.float32))
    return jnp.stack(ss, axis=1), jnp.stack(ms, axis=1)


@functools.lru_cache(maxsize=None)
def _strided_map_rows_fn(n: int, stride: int, shape):
    """ONE jitted program per (n, stride, shape): (B, k, gt, gt) map entry
    -> every ``stride``-th sample-major (row-raster) pixel row of the first
    ``n`` samples, as (r, k).  Device-side so only the kept seg-calibration
    rows are fetched over the relay (cfg.ocsvm_seg_max_rows)."""
    del shape  # cache key only: a new shape must not reuse a stale program

    @jax.jit
    def fn(mp):
        rows = mp[:n].transpose(0, 2, 3, 1).reshape(-1, mp.shape[1])
        return rows[::stride]
    return fn


@functools.lru_cache(maxsize=None)
def _fused_eval_fn(backbone, rgb_key: str, mods, gt_size: int, metric: str,
                   n_reweight: int, chunk, quantized_blur: bool):
    """ONE jitted program for the whole per-batch eval chain: feature
    extraction -> per-bank normalise + PatchCore scoring -> λ-weight stack
    -> linear-OCSVM fusion.

    Why one program: behind the remote relay every dispatch pays ~60 ms RPC
    (and block_until_ready is unreliable), so the unfused chain — 1-2
    extraction + 1-2 scoring + stack + fuse = up to 6 dispatches/batch —
    dominates warm system-eval wall clock (measured 20-28 img/s vs the same
    pipeline's 97 img/s device-only rate).  The device math is the same
    jit bodies inlined back to back — results match the staged path to
    float-rounding tolerance, not bitwise: XLA may re-associate across the
    former program boundaries (measured ~1e-6 absolute, e.g. the λ map
    scale folding into the blur matmuls).  On a co-located host the win is
    just fewer launches.  Cached at module level on (backbone instance, static
    scoring config) so the fresh per-class method objects of
    ``run_detection`` reuse the traced program.

    mods: tuple of (feature_key, lam_s, lam_m) per bank, bank order.
    Single-device program — DP-eval meshes use ``_fused_eval_dp_fn`` (the
    same body under shard_map) and row-sharded banks keep the staged path
    (their collectives live in the scoring stage).  The calibration fit
    pass deliberately does NOT use this program — it runs extraction + the
    shared ``_fused_scores_fn`` so its rows stay bit-identical to the
    cache_train_features path (see that builder).
    """
    return jax.jit(_build_fused_predict_body(
        backbone, rgb_key, mods, gt_size, metric, n_reweight, chunk,
        quantized_blur))


@functools.lru_cache(maxsize=None)
def _fused_eval_dp_fn(mesh, backbone, rgb_key: str, mods, gt_size: int,
                      metric: str, n_reweight: int, chunk,
                      quantized_blur: bool):
    """Data-parallel variant of ``_fused_eval_fn``: ONE shard_map program
    runs the whole predict chain (extraction -> scoring -> λ-stack -> OCSVM
    fusion) on each device's local batch shard against the replicated
    params/banks/fuser weights — no collectives, and the ~5 staged
    dispatches per batch (sharded extract, per-bank sharded scoring, stack,
    fuse) collapse to 1.  shard_map rather than sharded-input jit because
    GSPMD has no partitioning rule for the Mosaic custom calls inside
    extraction/scoring (CLAUDE.md).  Requires the (loader-padded) batch to
    be divisible by the mesh's 'data' axis — the caller gates on that.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    body = _build_fused_predict_body(backbone, rgb_key, mods, gt_size,
                                     metric, n_reweight, chunk,
                                     quantized_blur)
    return jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P(), P("data"), P(), P(), P()),
        out_specs=P("data"), check_vma=False))


def _build_fused_predict_body(backbone, rgb_key, mods, gt_size, metric,
                              n_reweight, chunk, quantized_blur):
    """The shared fused-predict body: (params, dev, bank_args, wd, ws) ->
    (s (B,), fused map (B, gt, gt)).  Jitted plain by ``_fused_eval_fn``,
    shard_map-wrapped by ``_fused_eval_dp_fn``."""
    def scores(params, dev, bank_args):
        out = backbone.extract(
            params, images=dev.get(rgb_key),
            organized_pc=dev.get("organized_pc"),
            compact_pts=dev.get("points_compact"))
        return _lam_weighted_scores(
            ((out[key], lam_s, lam_m, ba)
             for (key, lam_s, lam_m), ba in zip(mods, bank_args)),
            gt_size, metric, n_reweight, chunk, quantized_blur)

    def fn(params, dev, bank_args, wd, ws):
        s_vec, maps = scores(params, dev, bank_args)
        return s_vec @ wd, jnp.einsum("bkxy,k->bxy", maps, ws)
    return fn


def _sharded_lam_scores(feats, lams, bank_args, min_fns, gt_size, metric,
                        n_reweight, quantized_blur):
    """Per-bank scoring core of the fused shard-bank programs: normalise ->
    shard_map'd (min, argmin) over the local bank shard (Mosaic kernel on
    TPU, parallel/eval._sharded_min_fn) -> eq.7/upsample/blur tail in
    GSPMD-land (one-row gathers and matvecs over the sharded bank, which
    GSPMD partitions shard-local — the proven sharded_score_batch_fn
    pattern) -> λ-weight, stack.

    feats: per-bank (B, Np, D) tensors; lams: (lam_s, lam_m) per bank;
    min_fns: one shard_map'd min per bank (their kernel routing depends on
    per-bank LOCAL row counts).
    """
    from cmdiad_tpu.ops.scoring import patchcore_finish

    ss, ms = [], []
    for patches, (lam_s, lam_m), (bank, mean, std, n_valid, nn_table), mf \
            in zip(feats, lams, bank_args, min_fns):
        side = int(np.sqrt(patches.shape[1]))
        normed = (patches - mean) / std
        mv, mi = mf(normed, bank)

        def one(p, v, i, bank=bank, n_valid=n_valid, nn_table=nn_table,
                side=side):
            return patchcore_finish(
                p, bank, v, i, (side, side), out_size=gt_size,
                metric=metric, n_reweight=n_reweight, n_valid=n_valid,
                quantized_blur=quantized_blur, nn_table=nn_table)

        s, m = jax.vmap(one)(normed, mv, mi)
        ss.append(jnp.float32(lam_s) * s.astype(jnp.float32))
        ms.append(jnp.float32(lam_m) * m.astype(jnp.float32))
    return jnp.stack(ss, axis=1), jnp.stack(ms, axis=1)


def _build_fused_shard_bank_body(extract_fn, rgb_key, mods, min_fns,
                                 gt_size, metric, n_reweight,
                                 quantized_blur):
    """Fused whole-chain predict body for ROW-SHARDED banks: extraction ->
    ``_sharded_lam_scores`` -> linear-OCSVM fusion.  ONE jitted dispatch
    per batch where the staged sharded path costs ~5 (extract, per-bank
    sharded scoring, stack, fuse).

    ``extract_fn`` is pre-wrapped by the caller (shard_map over 'data' when
    the batch divides the mesh, replicated shard_map otherwise) so the
    Mosaic extraction kernels never meet GSPMD's missing custom-call
    partitioning rules.
    """
    def fn(params, dev, bank_args, wd, ws):
        out = extract_fn(params, dev)
        s_vec, maps = _sharded_lam_scores(
            [out[key] for key, _, _ in mods],
            [(ls, lm) for _, ls, lm in mods],
            bank_args, min_fns, gt_size, metric, n_reweight, quantized_blur)
        return s_vec @ wd, jnp.einsum("bkxy,k->bxy", maps, ws)
    return fn


def _build_fused_shard_bank_mtfi_body(extract_hall_fn, lam, min_fns,
                                      gt_size, metric, n_reweight,
                                      quantized_blur):
    """MTFI (FtoF/ItoF) variant of ``_build_fused_shard_bank_body``:
    ``extract_hall_fn`` (shard_map-wrapped main-modality extraction +
    in-program hallucination) -> main+fusion sharded scoring -> OCSVM
    fusion, as ONE program over row-sharded banks.  FtoI keeps the staged
    path — its hallucinated image re-enters the other backbone via a
    deliberate host round-trip.  lam: (lam_s_main, lam_m_main, lam_s_fusion,
    lam_m_fusion)."""
    lam_s_m, lam_m_m, lam_s_f, lam_m_f = lam

    def fn(params, dev, fusion_vars, bank_args, wd, ws):
        main_feat, hall = extract_hall_fn(params, fusion_vars, dev)
        s_vec, maps = _sharded_lam_scores(
            [main_feat, hall], [(lam_s_m, lam_m_m), (lam_s_f, lam_m_f)],
            bank_args, min_fns, gt_size, metric, n_reweight, quantized_blur)
        return s_vec @ wd, jnp.einsum("bkxy,k->bxy", maps, ws)
    return fn


@functools.lru_cache(maxsize=None)
def _fused_scores_fn(lam, gt_size: int, metric: str, n_reweight: int,
                     chunk, quantized_blur: bool):
    """λ-stacked scoring of ALREADY-EXTRACTED per-modality patch tensors in
    ONE program: normalise -> PatchCore score -> λ-weight -> stack.

    Used by the OCSVM-calibration pass (after the extraction program) AND
    by the cache_train_features path (on stored pass-1 features): sharing
    one program keeps their calibration rows BIT-IDENTICAL (equality-tested
    in test_e2e).  Folding extraction into this program would break that —
    XLA re-associates float rounding across former program boundaries
    (~1e-6, measured), which the SGD-OCSVM fit then amplifies.

    lam: tuple of (lam_s, lam_m) per modality, bank order.
    """
    @jax.jit
    def fn(patch_list, bank_args):
        return _lam_weighted_scores(
            ((patches, lam_s, lam_m, ba)
             for patches, (lam_s, lam_m), ba
             in zip(patch_list, lam, bank_args)),
            gt_size, metric, n_reweight, chunk, quantized_blur)
    return fn


@functools.lru_cache(maxsize=None)
def _fused_mtfi_eval_fn(backbone, fusion, flavor: str, main_modality: str,
                        lam, gt_size: int, metric: str, n_reweight: int,
                        chunk, quantized_blur: bool):
    """MTFI variant of ``_fused_eval_fn``: ONE program for main-modality
    extraction -> hallucination (FtoF MLP/conv on features, or HRNet on the
    raw input) -> main + fusion bank scoring -> λ-stack [-> OCSVM fusion].

    flavor: 'ftof' (fusion.generate on extracted features) or 'hrnet'
    (fusion net on the raw main-modality image).  FtoI is NOT fused — its
    hallucinated image re-enters the other backbone through a host
    round-trip by design (dense-pc compaction, methods/variants.py).
    lam: (lam_s_main, lam_m_main, lam_s_fusion, lam_m_fusion).
    """
    return jax.jit(_build_fused_mtfi_predict_body(
        backbone, fusion, flavor, main_modality, lam, gt_size, metric,
        n_reweight, chunk, quantized_blur))


@functools.lru_cache(maxsize=None)
def _fused_mtfi_eval_dp_fn(mesh, backbone, fusion, flavor: str,
                           main_modality: str, lam, gt_size: int,
                           metric: str, n_reweight: int, chunk,
                           quantized_blur: bool):
    """Data-parallel MTFI predict: the same fused body under shard_map over
    the cfg.mesh_shape mesh (batch sharded on 'data'; params, fusion
    variables, banks and fuser weights replicated; no collectives) — the
    MTFI analogue of ``_fused_eval_dp_fn``."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    body = _build_fused_mtfi_predict_body(
        backbone, fusion, flavor, main_modality, lam, gt_size, metric,
        n_reweight, chunk, quantized_blur)
    return jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P(), P("data"), P(), P(), P(), P()),
        out_specs=P("data"), check_vma=False))


def _build_fused_mtfi_predict_body(backbone, fusion, flavor, main_modality,
                                   lam, gt_size, metric, n_reweight, chunk,
                                   quantized_blur):
    """Shared MTFI fused-predict body: (params, dev, fusion_vars, bank_args,
    wd, ws) -> (s (B,), fused map (B, gt, gt))."""
    main_key = "rgb_patch" if main_modality == "rgb" else "xyz_patch"
    lam_s_m, lam_m_m, lam_s_f, lam_m_f = lam

    def scores(params, dev, fusion_vars, bank_args):
        out = backbone.extract(
            params, images=dev.get("rgb"),
            organized_pc=dev.get("organized_pc"),
            compact_pts=dev.get("points_compact"))
        if flavor == "hrnet":
            img = dev["rgb"] if main_modality == "rgb" else dev["organized_pc"]
            grid = fusion.apply(fusion_vars, img)           # (B, 56, 56, D)
            hall = grid.reshape(grid.shape[0], -1, grid.shape[-1])
        else:
            feat = (out["rgb_patch2"] if main_modality == "rgb"
                    else out["xyz_patch"])
            out_type = "xyz" if main_modality == "rgb" else "rgb"
            hall = fusion.apply(fusion_vars, feat, out_type,
                                method="generate")
        return _lam_weighted_scores(
            ((out[main_key], lam_s_m, lam_m_m, bank_args[0]),
             (hall, lam_s_f, lam_m_f, bank_args[1])),
            gt_size, metric, n_reweight, chunk, quantized_blur)

    def fn(params, dev, fusion_vars, bank_args, wd, ws):
        s_vec, maps = scores(params, dev, fusion_vars, bank_args)
        return s_vec @ wd, jnp.einsum("bkxy,k->bxy", maps, ws)
    return fn


@functools.lru_cache(maxsize=None)
def _fused_bank_pass_fn(backbone, rgb_key: str, flat_keys, stats_keys,
                        hall_spec=None):
    """ONE jitted program for the whole per-batch BANK pass: extraction
    [-> in-program hallucination] -> f32 flatten of scored-bank rows +
    streaming (sum, sum², count) partials for stats-only banks.  Replaces
    extract + per-bank ``_flatten_f32``/``_sum_sumsq`` dispatches (3 for
    Double, 5 for MTFI) with one — behind the remote relay each dispatch
    is a ~60 ms RPC (CLAUDE.md), so a 200-sample class saves seconds of
    pure launch latency in the fit's bank pass.

    FULL batches only — the padded tail batch must use the staged appends
    instead: a static tail slice here would re-trace (and remote-compile)
    the whole extraction program for one odd batch, costing far more than
    the 3-5 cheap dispatches it saves once per class.

    flat_keys / stats_keys: extraction-output keys; the literal key
    "fusion" selects the hallucinated features (hall_spec required:
    (fusion_module, flavor, main_modality) exactly as in
    ``_fused_mtfi_eval_fn``; FtoI keeps the staged pass — its hallucinated
    image re-enters the other backbone via a deliberate host round-trip).

    Bank rows match the staged path bit-for-bit in practice: the flatten
    is a widening cast + reshape of the same extraction outputs, and the
    stats partials reduce the same f32 arrays at the same shapes — there
    is no cross-boundary scale for XLA to fold (unlike the λ-weighting in
    the fused EVAL program); the fused-vs-staged e2e tests bound any
    residual divergence.
    """
    @jax.jit
    def fn(params, dev, fusion_vars):
        out = backbone.extract(
            params, images=dev.get(rgb_key),
            organized_pc=dev.get("organized_pc"),
            compact_pts=dev.get("points_compact"))
        feats = dict(out)
        if hall_spec is not None:
            fusion, flavor, main_modality = hall_spec
            if flavor == "hrnet":
                img = (dev[rgb_key] if main_modality == "rgb"
                       else dev["organized_pc"])
                grid = fusion.apply(fusion_vars, img)       # (B, 56, 56, D)
                feats["fusion"] = grid.reshape(grid.shape[0], -1,
                                               grid.shape[-1])
            else:
                feat = (out["rgb_patch2"] if main_modality == "rgb"
                        else out["xyz_patch"])
                out_type = "xyz" if main_modality == "rgb" else "rgb"
                feats["fusion"] = fusion.apply(fusion_vars, feat, out_type,
                                               method="generate")
        flats = tuple(
            feats[k].astype(jnp.float32).reshape(-1, feats[k].shape[-1])
            for k in flat_keys)
        stats = tuple(
            (jnp.sum(feats[k].astype(jnp.float32)),
             jnp.sum(jnp.square(feats[k].astype(jnp.float32))),
             jnp.int32(feats[k].size))
            for k in stats_keys)
        return flats, stats
    return fn


@functools.lru_cache(maxsize=None)
def _score_batch_sharded(mesh, feat_hw, out_size, metric, n_reweight, chunk,
                         quantized_blur=False):
    """shard_map-wrapped ``_score_batch``: batch sharded over 'data', bank
    and stats replicated, outputs gathered on the batch axis.  Needed
    because GSPMD has no partitioning rule for the Mosaic bank-min kernel
    the scoring program contains on TPU."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def g(patches, bank, mean, std, n_valid, nn_table):
        return _score_batch(patches, bank, mean, std, n_valid, nn_table,
                            feat_hw=feat_hw, out_size=out_size, metric=metric,
                            n_reweight=n_reweight, chunk=chunk,
                            quantized_blur=quantized_blur)

    return jax.jit(shard_map(
        g, mesh=mesh,
        in_specs=(P("data"), P(), P(), P(), P(), P()),
        out_specs=(P("data"), P("data")), check_vma=False))


class MemoryBankMethod:
    """Base: bank accumulation, coreset, scoring, late fusion, metrics."""

    #: bank names this method maintains (subclasses set)
    bank_names: Tuple[str, ...] = ()
    #: modality keys this method actually consumes; None = all.  Restricting
    #: them keeps single-modality methods from running BOTH frozen backbones
    #: (extract() forwards whatever modalities reach it).
    needed_keys: Optional[Tuple[str, ...]] = None

    def __init__(self, cfg: Config, backbone: DualBackbone,
                 params, fusion=None, fusion_vars=None,
                 fix_cross_stats: bool = False):
        self.cfg = cfg
        self.backbone = backbone
        self.params = params
        self.fusion = fusion
        self.fusion_vars = fusion_vars
        self.fix_cross_stats = fix_cross_stats
        self.class_name: Optional[str] = None

        # Bank rows accumulate as DEVICE arrays (f32, flattened to (rows, D))
        # — the fit pass never reads features back to host.  Behind the
        # remote-relay backend D2H runs at ~21 MB/s, so the old per-batch
        # np.asarray readback of ~100 MB of patches dominated fit wall-clock
        # (measured 470 s for a 200-sample class); on real hosts it still
        # serialises extraction with PCIe traffic for no reason — coreset,
        # normalisation and bank placement are all device-side anyway.
        self._bank_acc: Dict[str, List[jnp.ndarray]] = {n: [] for n in self.bank_names}
        # Streaming (sum, sum-of-squares, count) partials for banks that are
        # never scored and exist ONLY to feed the (cross-wired, Q1) scalar
        # statistics — their rows are never materialised at all.
        self._stats_acc: Dict[str, List] = {}
        self.banks: Dict[str, jnp.ndarray] = {}
        self.bank_sizes: Dict[str, int] = {}  # true rows before pad_bank
        # per-bank (Nb, n_reweight) NN tables (ops.scoring.bank_nn_table):
        # eq.7's m_star neighbourhood by lookup instead of a per-sample
        # full-bank distance pass
        self.nn_tables: Dict[str, jnp.ndarray] = {}
        self.coreset_idx: Dict[str, np.ndarray] = {}  # selected rows per bank
        self.stats: Dict[str, Tuple[float, float]] = {}

        self.detect_fuser = SGDOneClassSVM(
            nu=cfg.ocsvm_nu, max_iter=cfg.ocsvm_maxiter, random_state=42,
            backend=cfg.ocsvm_backend)
        self.seg_fuser = SGDOneClassSVM(
            nu=cfg.ocsvm_nu, max_iter=cfg.ocsvm_maxiter, random_state=42,
            backend=cfg.ocsvm_backend)
        self.s_lib: List = []        # ((1,k) host | (B,k) device, n) tuples
        self.s_map_lib: List = []    # (gt²,k) host rows or (B,k,gt,gt) device
        self._pending_preds: List = []  # deferred batched predictions

        self.image_preds: List[float] = []
        self.image_labels: List[int] = []
        self.pixel_preds: List[np.ndarray] = []
        self.pixel_labels: List[np.ndarray] = []
        self.predictions: List[np.ndarray] = []
        self.gts: List[np.ndarray] = []
        self.img_paths: List[str] = []

        self.image_rocauc = self.pixel_rocauc = 0.0
        self.au_pro = self.au_pro_001 = 0.0

    # ---------------- feature helpers ------------------------------------
    def _device_batch(self, sample: dict) -> dict:
        mesh = self._dp_eval_mesh()
        out = {}
        for k, batched_ndim in (("rgb", 4), ("organized_pc", 4),
                                ("depth3", 4), ("points_compact", 3)):
            if k not in sample:
                continue
            if self.needed_keys is not None and k not in self.needed_keys:
                continue
            v = np.asarray(sample[k])
            arr = jnp.asarray(v[None] if v.ndim == batched_ndim - 1 else v)
            if mesh is not None and arr.shape[0] % mesh.shape["data"] == 0:
                # shard the batch over 'data' so feature extraction runs
                # SPMD across the mesh, not just the scoring stage
                from jax.sharding import NamedSharding, PartitionSpec as P
                spec = P("data", *([None] * (arr.ndim - 1)))
                arr = jax.device_put(arr, NamedSharding(mesh, spec))
            out[k] = arr
        return out

    def extract(self, sample: dict, rgb_key: str = "rgb",
                with_2828: bool = False) -> dict:
        dev = self._device_batch(sample)
        images = dev.get(rgb_key)
        pc = dev.get("organized_pc")
        compact = dev.get("points_compact")
        mesh = self._dp_eval_mesh()
        batch0 = next(iter(dev.values())).shape[0] if dev else 0
        if (mesh is not None and dev
                and batch0 % mesh.shape["data"] == 0):
            return self._extract_sharded(mesh, images, pc, compact,
                                         with_2828)
        return self.backbone.extract(
            self.params, images=images, organized_pc=pc,
            with_2828=with_2828, compact_pts=compact)

    def _extract_sharded(self, mesh, images, pc, compact, with_2828: bool):
        """DP extraction under shard_map: every device runs the FULL
        extraction program (including the Mosaic FPS/interp kernels, which
        GSPMD cannot auto-partition — plain jit over sharded inputs would
        either fail or silently replicate them) on its local batch shard;
        there is no cross-device communication.
        """
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        flags = (images is not None, pc is not None, compact is not None)
        args = [a for a in (images, pc, compact) if a is not None]
        key = (id(mesh), flags, with_2828)
        cache = getattr(self, "_sm_extract_cache", None)
        if cache is None:
            cache = self._sm_extract_cache = {}
        fn = cache.get(key)
        if fn is None:
            backbone = self.backbone

            def f(params, *xs):
                it = iter(xs)
                im = next(it) if flags[0] else None
                p = next(it) if flags[1] else None
                c = next(it) if flags[2] else None
                return backbone.extract(params, images=im, organized_pc=p,
                                        with_2828=with_2828, compact_pts=c)

            pspec = jax.tree.map(lambda _: P(), self.params)
            out_shape = jax.eval_shape(f, self.params, *args)
            out_specs = jax.tree.map(lambda _: P("data"), out_shape)
            fn = jax.jit(shard_map(
                f, mesh=mesh,
                in_specs=(pspec, *([P("data")] * len(args))),
                out_specs=out_specs, check_vma=False))
            cache[key] = fn
        return fn(self.params, *args)

    # ---------------- bank building ---------------------------------------
    #: banks whose rows are never scored — only their scalar mean/std feeds
    #: the (cross-wired) normalisation statistics.  Subclasses override;
    #: their accumulation collapses to streaming partial sums.
    def _stats_only_banks(self) -> Tuple[str, ...]:
        return ()

    def _batch_is_full(self, batch) -> bool:
        """True when _n covers every stacked row (stack_batches pads the
        tail with copies of the last sample — the fused bank pass only
        serves full batches; the tail keeps the staged appends)."""
        for k in ("rgb", "organized_pc", "depth3", "points_compact"):
            v = batch.get(k)
            if isinstance(v, np.ndarray) and v.ndim >= 3:
                return v.shape[0] == batch["_n"]
        return False

    def _fused_single_device_ready(self) -> bool:
        """ONE gate for every single-device fused program: cfg.fused_eval,
        no data-parallel eval mesh, and no row-sharded bank (DP meshes and
        sharded banks keep the staged path — their collectives live inside
        the scoring stage).  Shared by BatchedScoresMixin and the MTFI
        methods so an added exclusion can't silently diverge between them."""
        return (self.cfg.fused_eval
                and self._dp_eval_mesh() is None
                and not (self.cfg.shard_bank and len(jax.devices()) > 1))

    def _bank_args_for(self, names) -> tuple:
        """Per-bank (bank, mean, std, n_valid, nn_table) tuples for the fused
        programs, CACHED per bank-name tuple: the stats/sizes are fixed after
        fit, and rebuilding the jnp scalars every predict batch would issue
        3 fresh host->device transfers per bank per batch — each an RPC
        behind the remote relay, defeating the fused path's one-dispatch
        point.  Invalidated wherever banks change (_finalize_banks,
        load_state) — same lifecycle as the _fuser_w cache."""
        names = tuple(names)
        cache = getattr(self, "_bank_args_cache", None)
        if cache is None:
            cache = self._bank_args_cache = {}
        if names not in cache:
            cache[names] = tuple(
                (self.banks[bn], jnp.float32(self.stats[bn][0]),
                 jnp.float32(self.stats[bn][1]),
                 jnp.int32(self.bank_sizes[bn]), self.nn_tables.get(bn))
                for bn in names)
        return cache[names]

    def _dp_fused_mesh(self, batch):
        """Mesh for the ONE-dispatch fused DP predict (shard_map around the
        whole chain), or None.  Gate: cfg.fused_eval, a data-parallel eval
        mesh, and the loader-padded batch divisible by the 'data' axis."""
        if not self.cfg.fused_eval:
            return None
        mesh = self._dp_eval_mesh()
        if mesh is None:
            return None
        for k in ("rgb", "organized_pc", "depth3", "points_compact"):
            v = batch.get(k)
            if isinstance(v, np.ndarray) and v.ndim >= 3:
                return (mesh if v.shape[0] % mesh.shape["data"] == 0
                        else None)
        return None

    def _append(self, name: str, patch) -> None:
        """patch: (B, Np, D), (Np, D) or (rows, D); device or host array.

        Rows stay on device (f32).  Stats-only banks accumulate only
        (sum, sum², count) — all device scalars, no sync.  Each branch is
        ONE jitted dispatch per batch (eager-op remote compiles, CLAUDE.md)."""
        arr = jnp.asarray(patch)
        if name in self._stats_only_banks():
            s1, s2 = _sum_sumsq(arr)
            self._stats_acc.setdefault(name, []).append((s1, s2, arr.size))
        else:
            self._bank_acc[name].append(_flatten_f32(arr))

    def _finalize_banks(self, norm_names, coreset_names,
                        stats_pairs: Optional[Dict[str, Tuple[str, str]]] = None,
                        place_names: Optional[Tuple[str, ...]] = None):
        """Concat accumulators, compute (possibly cross-wired) stats,
        normalise + coreset-select the requested banks.

        stats_pairs maps bank -> (mean_source, std_source); the reference's
        Q1 wiring is expressed by passing e.g. {'rgb': ('xyz', 'rgb')}.
        place_names limits which banks are padded/uploaded to the device —
        banks that only feed the (cross-wired) statistics are never scored
        and would waste ~25 MB HBM each per class.
        """
        # Every multi-op stage below runs as ONE jitted program — behind the
        # remote relay each eager op on a ~2 GB bank is a dispatch plus a
        # first-use remote compile (measured: the eager concat/stats/
        # normalize/gather/pad chain cost minutes per class in compiles).
        cat, cat_stats = {}, {}
        for n in self.bank_names:
            if self._bank_acc[n]:
                cat[n], m, s = _cat_mean_std(tuple(self._bank_acc[n]))
                cat_stats[n] = (m, s)
                self._bank_acc[n] = []  # free the chunk copies NOW — holding
                # chunks + cat (+ the normalized/padded copies below) would
                # peak at 2-3x total bank bytes in HBM (OOM at 500-sample
                # MTFI classes)
        keep_cache = (self.cfg.cache_train_features
                      and hasattr(self, "run_late_fusion_from_cache"))
        if keep_cache:
            # raw (un-normalised) pass-1 features, device-resident; only for
            # methods that actually consume the cache (otherwise multi-GB of
            # raw banks would stay pinned in HBM for the whole class)
            self._train_cache = cat
        stats_pairs = stats_pairs or {n: (n, n) for n in self.bank_names}
        if self.fix_cross_stats:
            stats_pairs = {n: (n, n) for n in self.bank_names}

        def bank_stats(n):
            """(mean, std ddof=1) over ALL elements of bank ``n`` — from the
            jitted two-pass when rows were kept, else from the streamed
            partials (f64-combined on host)."""
            if n in cat:
                return float(cat_stats[n][0]), float(cat_stats[n][1])
            parts = jax.device_get(self._stats_acc.get(n, []))
            if not parts:
                raise ValueError(
                    f"bank {n!r} has no accumulated rows or streamed stats "
                    "(is a stats source bank never fed?)")
            s1 = float(sum(np.float64(p[0]) for p in parts))
            s2 = float(sum(np.float64(p[1]) for p in parts))
            cnt = sum(int(p[2]) for p in parts)
            mean = s1 / max(cnt, 1)
            var = max(s2 - cnt * mean * mean, 0.0) / max(cnt - 1, 1)
            return mean, float(np.sqrt(var))

        src_stats = {m: bank_stats(m)
                     for pair in stats_pairs.values() for m in pair}
        for n in self.bank_names:
            msrc, ssrc = stats_pairs[n]
            self.stats[n] = (src_stats[msrc][0], src_stats[ssrc][1])
        place = place_names if place_names is not None else self.bank_names
        for n in self.bank_names:
            if n not in place:
                continue
            bank = cat[n]
            if n in norm_names:
                mean, std = self.stats[n]
                bank = _normalize(bank, jnp.float32(mean), jnp.float32(std))
            if n in coreset_names and self.cfg.f_coreset < 1:
                idx = coreset_select(
                    bank, self.cfg.f_coreset,
                    eps=self.cfg.coreset_eps,
                    seed=self.cfg.random_state or 0,
                    metric=self.cfg.dist_method_coreset,
                    compute_dtype=self.cfg.coreset_dtype)
                # stored as a DEVICE array: np.asarray here was the ONLY
                # host sync in the whole finalisation — it stalled the host
                # on bank 1's entire greedy scan (~45 s at production scale)
                # before bank 2's scan could even be dispatched, and kept
                # the late-fusion pass from enqueueing behind the scans.
                # With it gone the fit pipeline is dispatch-only until
                # run_late_fusion's bulk device_get (VERDICT r4 #4).
                self.coreset_idx[n] = idx
                padded = _gather_pad(bank, idx)
                self.bank_sizes[n] = int(idx.shape[0])
            else:
                padded = _pad_f32(bank)
                self.bank_sizes[n] = bank.shape[0]
            table = _bank_nn_table_jit(padded, jnp.int32(self.bank_sizes[n]),
                                       k=self.cfg.n_reweight,
                                       metric=self.cfg.dist_method_s)
            self.banks[n] = self._place_bank(padded)
            self.nn_tables[n] = self._replicate_small(table)
            if not keep_cache:
                del cat[n]  # free the raw concat as soon as it's placed
        self._bank_acc = {n: [] for n in self.bank_names}
        self._stats_acc = {}
        self._bank_args_cache = {}  # device-scalar tuples rebuilt lazily

    def _replicate_small(self, arr: jnp.ndarray) -> jnp.ndarray:
        """Replicate a small per-bank array across the active mesh (the NN
        table is ~0.8 MB at 65k rows), matching the bank's mesh placement."""
        mesh = (self._get_mesh() if self.cfg.shard_bank
                else self._dp_eval_mesh())
        if mesh is not None and len(jax.devices()) > 1:
            from cmdiad_tpu.parallel.mesh import replicate
            return replicate(mesh, arr)
        return arr

    def _get_mesh(self):
        """Mesh for multi-device eval: cfg.mesh_shape if set, else all
        devices on a 'data' axis.  None when single-device."""
        if len(jax.devices()) == 1:
            return None
        if not hasattr(self, "_mesh"):
            from cmdiad_tpu.parallel.mesh import make_mesh
            shape = self.cfg.mesh_shape or (len(jax.devices()),)
            self._mesh = make_mesh(tuple(shape), ("data",))
        return self._mesh

    def _dp_eval_mesh(self):
        """Mesh for data-parallel eval (explicitly requested via
        cfg.mesh_shape; bank-sharded scoring takes precedence)."""
        if not self.cfg.mesh_shape or self.cfg.shard_bank:
            return None
        return self._get_mesh()

    def _place_bank(self, bank: jnp.ndarray) -> jnp.ndarray:
        """Shard bank rows over the mesh (cfg.shard_bank), or replicate the
        bank across it for data-parallel eval (cfg.mesh_shape)."""
        if self.cfg.shard_bank and len(jax.devices()) > 1:
            from cmdiad_tpu.parallel.mesh import shard_rows
            mesh = self._get_mesh()
            n_dev = mesh.shape["data"]
            pad = (-bank.shape[0]) % n_dev
            if pad:
                from cmdiad_tpu.ops.scoring import PAD_VALUE
                bank = jnp.concatenate(
                    [bank,
                     jnp.full((pad, bank.shape[1]), PAD_VALUE, bank.dtype)])
            return shard_rows(mesh, bank)
        mesh = self._dp_eval_mesh()
        if mesh is not None:
            from cmdiad_tpu.parallel.mesh import replicate
            return replicate(mesh, bank)
        return bank

    # ---------------- scoring ---------------------------------------------
    def _chunk(self):
        # sharded banks need the dense (single-pass) distance path so GSPMD
        # keeps the matmul shard-local; chunk-scan otherwise
        return None if self.cfg.shard_bank and len(jax.devices()) > 1 else 8192

    def _sharded_scoring(self, bank_name: str, side: int):
        """shard_map'd kernel-speed scoring for row-sharded banks, or None.

        cos_dist keeps the GSPMD dense path (_chunk() -> None): PAD_VALUE
        rows are only value-far under l2/l1, and the shard_map min pass does
        no index masking.
        """
        if (not self.cfg.shard_bank or len(jax.devices()) <= 1
                or self.cfg.dist_method_s == "cos_dist"):
            return None
        from cmdiad_tpu.parallel.eval import (sharded_score_batch_fn,
                                              _use_scoring_kernel)
        mesh = self._get_mesh()
        local = self.banks[bank_name].shape[0] // mesh.shape["data"]
        return sharded_score_batch_fn(
            mesh, (side, side), self.cfg.gt_size, self.cfg.dist_method_s,
            self.cfg.n_reweight,
            _use_scoring_kernel(local, self.cfg.dist_method_s),
            self.cfg.quantized_blur)

    def score_patch(self, patch, bank_name: str):
        """patch (1, Np, D) or (Np, D) -> (s scalar, s_map (gt, gt) np)."""
        p = patch[0] if patch.ndim == 3 else patch
        side = int(np.sqrt(p.shape[0]))
        mean, std = self.stats[bank_name]
        sharded = self._sharded_scoring(bank_name, side)
        if sharded is not None:
            s, s_map = sharded(
                p[None], self.banks[bank_name], jnp.float32(mean),
                jnp.float32(std), jnp.int32(self.bank_sizes[bank_name]),
                self.nn_tables.get(bank_name))
            return s[0], s_map[0]
        s, s_map = _score_one(
            p, self.banks[bank_name], jnp.float32(mean), jnp.float32(std),
            jnp.int32(self.bank_sizes[bank_name]),
            self.nn_tables.get(bank_name),
            feat_hw=(side, side), out_size=self.cfg.gt_size,
            metric=self.cfg.dist_method_s, n_reweight=self.cfg.n_reweight,
            chunk=self._chunk(), quantized_blur=self.cfg.quantized_blur)
        return s, s_map

    def score_patch_batch(self, patches, bank_name: str):
        """patches (B, Np, D) -> (s (B,), s_map (B, gt, gt)) in one dispatch.

        With cfg.mesh_shape set, samples are sharded over the mesh 'data'
        axis against the replicated bank (data-parallel eval — the
        multi-chip scaling axis the reference's batch-1 loop leaves unused,
        SURVEY.md §2.4); results are bit-identical to single-device.
        """
        side = int(np.sqrt(patches.shape[1]))
        mean, std = self.stats[bank_name]
        sharded = self._sharded_scoring(bank_name, side)
        if sharded is not None:
            return sharded(
                patches, self.banks[bank_name], jnp.float32(mean),
                jnp.float32(std), jnp.int32(self.bank_sizes[bank_name]),
                self.nn_tables.get(bank_name))
        mesh = self._dp_eval_mesh()
        b = patches.shape[0]
        static = dict(feat_hw=(side, side), out_size=self.cfg.gt_size,
                      metric=self.cfg.dist_method_s,
                      n_reweight=self.cfg.n_reweight, chunk=self._chunk(),
                      quantized_blur=self.cfg.quantized_blur)
        args = (self.banks[bank_name], jnp.float32(mean), jnp.float32(std),
                jnp.int32(self.bank_sizes[bank_name]),
                self.nn_tables.get(bank_name))
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            n_dev = mesh.shape["data"]
            pad = (-b) % n_dev
            if pad:  # keep the batch mesh-divisible; padded rows sliced off
                patches = jnp.concatenate(
                    [patches, jnp.broadcast_to(patches[:1],
                                               (pad,) + patches.shape[1:])])
            patches = jax.device_put(
                patches, NamedSharding(mesh, P("data", None, None)))
            # shard_map (not plain jit): the scoring program can contain
            # the Mosaic bank-min kernel, which GSPMD cannot partition —
            # each device scores its local batch shard against the
            # replicated bank, with zero collectives
            s, s_map = _score_batch_sharded(mesh, **static)(patches, *args)
        else:
            s, s_map = _score_batch(patches, *args, **static)
        return s[:b], s_map[:b]

    # ---------------- late fusion ------------------------------------------
    def _push_late_fusion(self, s_vec: np.ndarray, s_maps: np.ndarray):
        """s_vec (k,), s_maps (k, gt, gt) λ-weighted (per-sample host path)."""
        self.s_lib.append((np.asarray(s_vec, np.float64).reshape(1, -1), 1))
        self.s_map_lib.append(
            np.asarray(s_maps, np.float64).reshape(len(s_vec), -1).T)

    def _push_late_fusion_batch(self, s_vec, s_maps, n: int):
        """s_vec (B, k), s_maps (B, k, gt, gt) — DEVICE arrays, deferred;
        ``n`` valid rows (loader tail padding is sliced off host-side).

        The calibration pass stays free of per-batch host syncs AND of
        per-batch device slice programs; everything is fetched in one bulk
        device_get inside ``run_late_fusion``."""
        self.s_lib.append((s_vec, n))
        self.s_map_lib.append(s_maps)

    def _weight_stack(self, s_list, m_list, lam_s, lam_m):
        """ONE jitted program for the λ-weight + stack tail of a batched
        scores pass: (k×(B,), k×(B,gt,gt)) -> ((B,k), (B,k,gt,gt)).

        Behind the remote relay every eager jnp op is a dispatch (and, the
        first time, a multi-second remote-service compile) — the eager form
        of this tail cost ~10 programs per batch shape (measured: it
        dominated eval wall-clock at 2.3 s/batch).  The program is cached
        at module level on the λ tuples (``_weight_stack_fn``)."""
        return _weight_stack_fn(lam_s, lam_m)(tuple(s_list), tuple(m_list))

    def run_late_fusion(self):
        # seg-fuser row budget: at production scale the λ-weighted map rows
        # number n_train·gt² (~10M) and sklearn's SGD fit on them measures
        # ~65 s of host time per class; a deterministic per-entry stride
        # reproduces the 2-feature direction to ~1e-3 at a fraction of the
        # rows.  For BATCHED (B, k, gt, gt) device entries the stride runs
        # ON DEVICE (_strided_map_rows_fn) so only the kept rows cross the
        # relay's 21 MB/s D2H path; 2-D per-sample entries arrive from
        # _push_late_fusion as HOST arrays (their D2H already happened in
        # the per-sample _scores path), so striding them here is a cheap
        # host slice, not a transfer saving.  This cap is a deliberate
        # fit-time deviation from the reference's full-row fit
        # (features.py:352-358) — bookkept in PARITY.md; ocsvm_seg_max_rows
        # =None restores the exact full-row behaviour.
        cap = getattr(self.cfg, "ocsvm_seg_max_rows", None)
        total = sum(
            mp.shape[0] if getattr(mp, "ndim", 2) == 2
            else n * mp.shape[2] * mp.shape[3]
            for (_, n), mp in zip(self.s_lib, self.s_map_lib))
        stride = max(1, -(-total // cap)) if cap else 1

        s_rows, m_sel = [], []
        for (sv, n), mp in zip(self.s_lib, self.s_map_lib):
            sv = np.asarray(jax.device_get(sv), np.float64)[:n]
            s_rows.append(sv.reshape(-1, sv.shape[-1]))
            if getattr(mp, "ndim", 2) == 2:
                # per-sample entries arrive pre-flattened (gt², k)
                m_sel.append(np.asarray(mp)[::stride])
            elif stride == 1:
                m_sel.append(mp)  # fetched whole below
            else:
                m_sel.append(_strided_map_rows_fn(
                    int(n), int(stride), mp.shape)(mp))
        m_rows = []
        for mp, (_, n) in zip(jax.device_get(m_sel), self.s_lib):
            mp = np.asarray(mp, np.float64)
            # unstrided batched device entries are (B, k, gt, gt) ->
            # sample-major (n·gt², k); strided ones arrive already (r, k)
            m_rows.append(mp if mp.ndim == 2
                          else mp[:n].transpose(0, 2, 3, 1)
                                     .reshape(-1, mp.shape[1]))
        self.detect_fuser.fit(np.concatenate(s_rows, axis=0))
        self.seg_fuser.fit(np.concatenate(m_rows, axis=0))
        self.s_lib, self.s_map_lib = [], []
        self._fuser_w = None  # refreshed lazily on the next predict batch

    def _record_prediction_batch(self, s_vec, s_maps, masks, labels, paths):
        """Batched DEFERRED prediction: s_vec (B, k) and s_maps (B, k, gt,
        gt) stay on device; the linear OCSVM ``score_samples`` (= x·coef,
        fusion/ocsvm.py) is applied on device so only the FUSED (B, gt, gt)
        map ever crosses to host — and only in the bulk fetch at
        ``flush_predictions`` time.  The eval loop therefore runs purely
        async: no per-batch sync, no per-batch host OCSVM hop.  masks/
        labels/paths arrive already sliced to the batch's valid rows."""
        s, fused = _fuse_predict(s_vec, s_maps, *self._fuser_weights())
        self._record_prediction_fused(s, fused, masks, labels, paths)

    def _fuser_weights(self):
        """Device copies of the two fitted linear-OCSVM coefficient vectors
        (lazily refreshed after each run_late_fusion/load_state)."""
        if getattr(self, "_fuser_w", None) is None:
            self._fuser_w = (
                jnp.asarray(np.asarray(self.detect_fuser.coef_).reshape(-1),
                            jnp.float32),
                jnp.asarray(np.asarray(self.seg_fuser.coef_).reshape(-1),
                            jnp.float32))
        return self._fuser_w

    def _record_prediction_fused(self, s, fused, masks, labels, paths):
        """Defer already-fused device predictions (s (B,), fused (B,gt,gt));
        padded tail rows are ignored at flush time (len(labels) = n <= B).
        NOTE: no copy_to_host_async here — starting the D2H mid-loop
        contends with dispatch RPCs on the relay channel (measured: warm
        eval 1.7 s -> 2.4 s); the bulk fetch at flush time wins."""
        self._pending_preds.append(
            (s, fused, np.asarray(masks), list(labels), list(paths)))

    def flush_predictions(self):
        """Materialise deferred batched predictions (one bulk device_get)."""
        pend = getattr(self, "_pending_preds", [])
        if not pend:
            return
        self._pending_preds = []
        fetched = jax.device_get([(s, f) for s, f, _, _, _ in pend])
        for (s, fused), (_, _, masks, labels, paths) in zip(fetched, pend):
            for i in range(len(labels)):  # len(labels) = n <= B
                self._store_prediction(
                    float(s[i]), np.asarray(fused[i], np.float64),
                    masks[i], labels[i], paths[i])

    def _record_prediction(self, s_vec, s_maps, mask, label, rgb_path):
        """Fuse λ-weighted scores through the OCSVMs and store metrics rows
        (per-sample host path: exact sklearn f64 semantics)."""
        s = float(self.detect_fuser.score_samples(
            np.asarray(s_vec, np.float64).reshape(1, -1))[0])
        flat = np.asarray(s_maps, np.float64).reshape(len(s_vec), -1).T
        fused_map = self.seg_fuser.score_samples(flat).reshape(
            self.cfg.gt_size, self.cfg.gt_size)
        self._store_prediction(s, fused_map, mask, label, rgb_path)

    def _store_prediction(self, s, fused_map, mask, label, rgb_path):
        fused_map = np.asarray(fused_map).reshape(self.cfg.gt_size,
                                                  self.cfg.gt_size)
        mask_np = np.asarray(mask).reshape(self.cfg.gt_size, self.cfg.gt_size)
        self.image_preds.append(s)
        self.image_labels.append(int(label))
        self.pixel_preds.append(fused_map.reshape(-1))
        self.pixel_labels.append(mask_np.reshape(-1))
        self.predictions.append(fused_map)
        self.gts.append(mask_np)
        self.img_paths.append(rgb_path)
        if self.cfg.save_seg_results:
            # per-image seg-map dump mirroring the dataset tree (reference
            # multiple_features.py:1005-1015, .pt -> .npz)
            import os
            rel = os.path.splitext(os.path.basename(str(rgb_path)))[0]
            out_dir = os.path.join(self.cfg.results_dir, "segmentation",
                                   str(self.class_name))
            os.makedirs(out_dir, exist_ok=True)
            np.savez_compressed(os.path.join(out_dir, rel + ".npz"),
                                s_map=fused_map, gt=mask_np)

    # ---------------- fitted-state persistence ------------------------------
    def save_state(self, path: str) -> None:
        """Persist the fitted per-class serving state: padded banks + NN
        tables, true row counts, Q1 (cross-wired) scalar stats and the two
        linear OCSVM fusers — everything ``predict`` needs.  The reference
        never persists banks (rebuilt per run per class, SURVEY.md §5);
        loading this skips the entire fit (two train passes + coreset)."""
        import json
        arrs = {}
        for n in self.banks:
            arrs[f"bank_{n}"] = np.asarray(jax.device_get(self.banks[n]))
            arrs[f"nn_{n}"] = np.asarray(jax.device_get(self.nn_tables[n]))
        for tag, f in (("detect", self.detect_fuser), ("seg", self.seg_fuser)):
            arrs[f"{tag}_coef"] = np.asarray(f.coef_, np.float64).reshape(-1)
            arrs[f"{tag}_offset"] = np.asarray(f.offset_,
                                               np.float64).reshape(-1)
        meta = {"bank_sizes": self.bank_sizes,
                "stats": {k: list(v) for k, v in self.stats.items()},
                "class_name": self.class_name,
                "fingerprint": self.state_fingerprint()}
        arrs["meta_json"] = np.frombuffer(
            json.dumps(meta).encode(), np.uint8).copy()
        # tmp + atomic rename: a run killed mid-save (timeout, Ctrl-C) must
        # never leave a truncated npz at the final path — runner.fit treats
        # an unreadable cache as refit-and-overwrite, but a half-written
        # file should not exist even transiently
        import os
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:  # handle, not name: savez would append
            np.savez_compressed(f, **arrs)  # '.npz' to a bare tmp path
        os.replace(tmp, path)

    def state_fingerprint(self) -> dict:
        """JSON-safe snapshot of every config field the fitted state depends
        on (see ``_FINGERPRINT_FIELDS``), plus the persistence format
        version.  ``load_state`` refuses state with a different fingerprint."""
        fp = {f: getattr(self.cfg, f) for f in _FINGERPRINT_FIELDS}
        fp["_format"] = _STATE_FORMAT_VERSION
        return fp

    def load_state(self, path: str) -> None:
        """Restore ``save_state`` output; banks re-take their configured
        mesh placement (shard_bank / DP replication) on this process's
        devices.

        Raises :class:`StateFingerprintMismatch` when the persisted
        fingerprint differs from the current config (or predates
        fingerprinting) — ``runner.fit`` falls back to a fresh fit then."""
        import json
        z = np.load(path)
        meta = json.loads(bytes(z["meta_json"]).decode())
        saved_fp = meta.get("fingerprint")
        fp = self.state_fingerprint()
        if saved_fp != fp:
            diff = sorted(
                k for k in fp
                if not isinstance(saved_fp, dict) or saved_fp.get(k) != fp[k])
            raise StateFingerprintMismatch(
                f"{path}: persisted state does not match the current config "
                f"(differing fields: {diff}); refit required")
        self.class_name = meta["class_name"]
        self.bank_sizes = {k: int(v) for k, v in meta["bank_sizes"].items()}
        self.stats = {k: (float(v[0]), float(v[1]))
                      for k, v in meta["stats"].items()}
        self.banks, self.nn_tables = {}, {}
        for key in z.files:
            if key.startswith("bank_"):
                n = key[len("bank_"):]
                self.banks[n] = self._place_bank(jnp.asarray(z[key]))
                self.nn_tables[n] = self._replicate_small(
                    jnp.asarray(z[f"nn_{n}"]))
        self.detect_fuser.load_weights(z["detect_coef"], z["detect_offset"])
        self.seg_fuser.load_weights(z["seg_coef"], z["seg_offset"])
        self._fuser_w = None  # device copies refreshed lazily
        self._bank_args_cache = {}

    def reset_predictions(self):
        """Clear accumulated predictions (e.g. to re-run an eval pass)."""
        self.image_preds, self.image_labels = [], []
        self.pixel_preds, self.pixel_labels = [], []
        self.predictions, self.gts, self.img_paths = [], [], []
        self._pending_preds = []

    # ---------------- metrics ----------------------------------------------
    def calculate_metrics(self) -> dict:
        self.flush_predictions()
        image_preds = np.asarray(self.image_preds)
        image_labels = np.asarray(self.image_labels)
        if self.cfg.save_raw_results:
            # per-image raw score CSV (reference features.py:316-318)
            import os
            out_dir = os.path.join(self.cfg.results_dir, "raw")
            os.makedirs(out_dir, exist_ok=True)
            with open(os.path.join(
                    out_dir, f"{self.class_name}_raw_results.csv"), "w") as f:
                for s, lab, path in zip(image_preds, image_labels,
                                        self.img_paths):
                    f.write(f"{s},{lab},{path}\n")
        pixel_preds = np.concatenate(self.pixel_preds)
        pixel_labels = np.concatenate(self.pixel_labels)
        self.image_rocauc = roc_auc_score(image_labels, image_preds)
        self.pixel_rocauc = roc_auc_score(pixel_labels, pixel_preds)
        self.au_pro, _ = calculate_au_pro(self.gts, self.predictions)
        self.au_pro_001, _ = calculate_au_pro(self.gts, self.predictions, 0.01)
        return {
            "image_rocauc": self.image_rocauc,
            "pixel_rocauc": self.pixel_rocauc,
            "au_pro": self.au_pro,
            "au_pro_001": self.au_pro_001,
        }

    # ---------------- batched entry points ----------------------------------
    # Generic fallbacks loop per sample; RGB/Point/Double override with true
    # single-dispatch batched paths (methods/variants.BatchedScoresMixin).
    @staticmethod
    def _split_batch(batch: dict):
        n = batch.get("_n", len(batch["rgb"]))
        for i in range(n):
            yield {k: (v[i] if isinstance(v, (np.ndarray, list)) else v)
                   for k, v in batch.items() if k != "_n"}

    def add_batch_to_mem_bank(self, batch: dict, class_name: str = None):
        for sample in self._split_batch(batch):
            self.add_sample_to_mem_bank(sample, class_name=class_name)

    def add_batch_to_late_fusion_mem_bank(self, batch: dict):
        for sample in self._split_batch(batch):
            self.add_sample_to_late_fusion_mem_bank(sample)

    def predict_batch(self, batch: dict):
        for sample in self._split_batch(batch):
            self.predict(sample, sample["gt"], sample["label"],
                         sample["rgb_path"])

    # ---------------- abstract protocol -------------------------------------
    def add_sample_to_mem_bank(self, sample: dict, class_name: str = None):
        raise NotImplementedError

    def run_coreset(self):
        raise NotImplementedError

    def add_sample_to_late_fusion_mem_bank(self, sample: dict):
        raise NotImplementedError

    def predict(self, sample: dict, mask, label, rgb_path: str):
        raise NotImplementedError
