"""PatchCore-style memory-bank anomaly scoring.

Replaces the reference's per-sample scoring stack
(``Features.calculate_dist`` + ``Features.compute_single_s_s_map``,
feature_extractors/features.py:186-205,225-297): nearest-neighbour distance
of each test patch to the memory bank, image score from the most anomalous
patch reweighted by its bank neighbourhood (paper eq. 7), and a blurred
bilinear-upsampled segmentation map.

TPU design notes:
  * the (Np, Nb) distance matrix is never fully materialised for large banks —
    ``bank_min_dist`` scans over bank chunks keeping a running (min, argmin),
    so HBM traffic is one pass over the bank at matmul speed (MXU does the
    -2·x·yᵀ term);
  * banks are padded to a bucket size for jit-cache friendliness; padding rows
    are filled with ``PAD_VALUE`` so they can never win a min;
  * everything downstream of the distances (argmax, top-3 reweight, resize,
    blur) is fused into the same jitted program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from cmdiad_tpu.ops.blur import knn_gaussian_blur
from cmdiad_tpu.ops.pooling import bilinear_resize

# Value written into bank padding rows; far from any normalised feature.
PAD_VALUE = 1e6


def cdist(a: jnp.ndarray, b: jnp.ndarray, metric: str = "l2") -> jnp.ndarray:
    """Dense pairwise distances (N, D) x (M, D) -> (N, M).

    metric: 'l2' (euclidean, torch.cdist), 'l1' (cityblock),
    'cos_dist' (1 - cosine similarity) — the reference's three
    ``dist_method_s`` options (features.py:186-205).  'l2_int8' selects the
    int8-quantised streaming kernel where the kernel runs
    (``use_scoring_kernel``); every dense/jnp path — including this one —
    computes it as exact-f32 l2 (the quantisation applies only to the
    Mosaic kernel's -2·q·bᵀ cross term).
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if metric == "l2_int8":
        metric = "l2"
    if metric == "l2":
        a2 = jnp.sum(a * a, -1)[:, None]
        b2 = jnp.sum(b * b, -1)[None, :]
        ab = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
        return jnp.sqrt(jnp.maximum(a2 + b2 - 2.0 * ab, 0.0))
    if metric == "cos_dist":
        an = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-30)
        bn = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-30)
        return 1.0 - jnp.dot(an, bn.T, preferred_element_type=jnp.float32)
    if metric == "l1":
        # Chunk over rows of `a` to bound the (chunk, M, D) broadcast.
        chunk = max(1, min(a.shape[0], 2 ** 22 // max(b.shape[0], 1)))
        pad = (-a.shape[0]) % chunk
        a_p = jnp.pad(a, ((0, pad), (0, 0)))

        def f(rows):
            return jnp.sum(jnp.abs(rows[:, None, :] - b[None, :, :]), axis=-1)

        out = lax.map(f, a_p.reshape(-1, chunk, a.shape[1]))
        return out.reshape(-1, b.shape[0])[: a.shape[0]]
    raise ValueError(f"unknown metric {metric!r}")


def mask_padding_cols(d: jnp.ndarray, n_valid, col_offset=0):
    """Force distances to bank padding rows to BIG.

    PAD_VALUE rows are intrinsically far under l2/l1, but under cos_dist a
    constant row has distance in [0, 2] and can win the min — padding must
    be masked by index, not by value.
    """
    cols = jnp.arange(d.shape[-1]) + col_offset
    return jnp.where(cols[None, :] < n_valid, d, jnp.float32(3.4e38))


def bank_min_dist(patch: jnp.ndarray, bank: jnp.ndarray,
                  metric: str = "l2", chunk: int | None = 8192,
                  with_argmin: bool = True, n_valid=None):
    """Per-patch (min distance[, argmin index]) over the bank, chunk-scanned.

    Args:
      patch: (Np, D); bank: (Nb, D) with Nb a multiple of ``chunk`` or smaller.
      chunk: scan block size; None = dense single pass (required when the
        bank rows are sharded across a mesh — the scan's reshape would
        force a resharding gather, while the dense form lets GSPMD keep the
        distance matmul and min/argmin shard-local with one all-reduce).
      with_argmin: the per-chunk index reduce costs about as much as the min
        itself; pass False when indices aren't needed (min_idx is None then).
      n_valid: real bank row count; rows beyond it (pad_bank padding) are
        index-masked (required for cos_dist, harmless elsewhere).
    Returns:
      min_val (Np,), min_idx (Np,) int32 or None.
    """
    nb = bank.shape[0]

    def _mask(d, offset=0):
        return d if n_valid is None else mask_padding_cols(d, n_valid, offset)

    if chunk is None or nb <= chunk:
        d = _mask(cdist(patch, bank, metric))
        mi = jnp.argmin(d, axis=1).astype(jnp.int32) if with_argmin else None
        return jnp.min(d, axis=1), mi

    pad = (-nb) % chunk
    bank_p = jnp.pad(bank, ((0, pad), (0, 0)), constant_values=PAD_VALUE)
    n_chunks = bank_p.shape[0] // chunk
    chunks = bank_p.reshape(n_chunks, chunk, bank.shape[1])

    if not with_argmin:
        def body_v(best_val, xs):
            c_idx, rows = xs
            d = _mask(cdist(patch, rows, metric), c_idx * chunk)
            return jnp.minimum(best_val, jnp.min(d, axis=1)), None

        mv, _ = lax.scan(body_v,
                         jnp.full((patch.shape[0],), jnp.inf, jnp.float32),
                         (jnp.arange(n_chunks), chunks))
        return mv, None

    def body(carry, xs):
        best_val, best_idx = carry
        c_idx, rows = xs
        d = _mask(cdist(patch, rows, metric), c_idx * chunk)
        v = jnp.min(d, axis=1)
        i = jnp.argmin(d, axis=1).astype(jnp.int32) + c_idx * chunk
        take = v < best_val
        return (jnp.where(take, v, best_val), jnp.where(take, i, best_idx)), None

    init = (jnp.full((patch.shape[0],), jnp.inf, jnp.float32),
            jnp.zeros((patch.shape[0],), jnp.int32))
    (mv, mi), _ = lax.scan(body, init, (jnp.arange(n_chunks), chunks))
    return mv, mi


def bank_nn_table(bank: jnp.ndarray, k: int = 3, n_valid=None,
                  metric: str = "l2", chunk: int = 2048) -> jnp.ndarray:
    """Per-row k nearest bank rows, self first at distance ~0 — (Nb, k) int32.

    Precomputed ONCE per bank (fit time) so eq.7's reweight needs no
    per-sample full-bank m_star row pass at eval: ``patchcore_finish`` then
    looks the neighbourhood up by the NN index instead of streaming the
    bank again (~0.3 ms/img of HBM traffic at the 65k+16k flagship banks).
    Same iterative min-extraction (ties to first occurrence) as the runtime
    path it replaces, computed in exact f32.
    """
    nb, d = bank.shape
    c = min(chunk, nb)
    while nb % c:
        c //= 2

    def one(rows):
        dist = cdist(rows, bank, metric)
        if n_valid is not None:
            dist = mask_padding_cols(dist, n_valid)
        cols = jnp.arange(nb)[None, :]
        idxs = []
        for _ in range(k):
            j = jnp.argmin(dist, axis=1).astype(jnp.int32)
            idxs.append(j)
            dist = jnp.where(cols == j[:, None], jnp.float32(3.4e38), dist)
        return jnp.stack(idxs, axis=1)

    return lax.map(one, bank.reshape(nb // c, c, d)).reshape(nb, k)


def use_scoring_kernel(rows: int, metric: str) -> bool:
    """THE routing gate for the Mosaic streaming bank-min kernel: l2 on TPU
    with 1024-aligned rows above the measured ~32k-row jnp/kernel crossover.
    Single source of truth — patchcore_score, the shard_map'd sharded-bank
    path (parallel/eval) and bench.py's custom-call FLOPs correction all
    consult this one predicate.  'l2_int8' is l2 with the kernel's cross
    term quantised to int8 (2x MXU peak on v5e) — same routing."""
    return (metric in ("l2", "l2_int8") and jax.default_backend() == "tpu"
            and rows % 1024 == 0 and rows >= 32768)


def patchcore_score(patch: jnp.ndarray, bank: jnp.ndarray,
                    feat_hw, out_size: int = 224, metric: str = "l2",
                    n_reweight: int = 3, blur_radius: float = 4.0,
                    chunk: int | None = 8192, n_valid=None,
                    quantized_blur: bool = False, nn_table=None):
    """Image score + segmentation map for one sample against one bank.

    Mirrors ``Features.compute_single_s_s_map`` (features.py:225-297):
      s_map  = per-patch NN distance, reshaped (h, w), bilinear -> out_size²,
               PIL-style Gaussian blur;
      s*     = max over patches of the NN distance;
      reweight (paper eq. 7): with m_test the most anomalous patch and m_star
               its bank NN, find the ``n_reweight`` NNs of m_star *in the
               bank* (itself included at distance 0), drop the first, and
               compute  w = 1 - exp(s*/√D) / Σ exp(‖m_test - nn_j‖/√D);
      s      = w · s*.

    Args:
      patch: (Np, D) normalised test patches; bank: (Nb, D).
      feat_hw: (h, w) with h*w == Np.
    Returns:
      s (scalar), s_map (out_size, out_size).
    """
    # l2 on TPU with a bucket-padded bank: use the fused streaming Pallas
    # kernel (ops.pallas_scoring) — the distance matrix never materialises.
    # Padding rows are value-far under l2, so no index masking is needed.
    # (measured crossover: jnp wins below ~32k rows, the kernel above.)
    # NOTE the kernel's quantised -2·q·bᵀ product (bf16 here, s8 under
    # 'l2_int8') only SELECTS the argmin row since round 5: the returned
    # min values are exactly-recomputed f32 distances of the selected rows
    # (pallas_scoring._exact_refine), so s_map/s_star carry no product-
    # rounding error — only the m_star/argmin CHOICE can differ from an
    # exact pass, between near-tied bank rows (and then the reported value
    # is the true distance of that near-tie).
    # On the jnp path, per-patch argmin tracking inside the chunked scan
    # costs as much as the distance matmul itself (the VPU index-reduce
    # doubles the pass) and is only needed for ONE patch, so min values
    # only are computed there and m_star is re-derived exactly below.
    use_kernel = chunk is not None and use_scoring_kernel(
        bank.shape[0], metric)
    if use_kernel:
        from cmdiad_tpu.ops.pallas_scoring import bank_min_dist_pallas
        # the kernel's running (min, argmin) update is one fused pass, so
        # the argmin is free here — and saves re-deriving the top patch's
        # nearest bank row below with a full-bank matvec (a whole extra
        # 200 MB bank stream per sample at 65k rows)
        min_val, min_idx = bank_min_dist_pallas(
            patch, bank,
            compute_dtype="int8" if metric == "l2_int8" else "bfloat16")
    else:
        min_val, min_idx = bank_min_dist(patch, bank, metric, chunk,
                                         with_argmin=False, n_valid=n_valid)
    return patchcore_finish(patch, bank, min_val, min_idx, feat_hw,
                            out_size=out_size, metric=metric,
                            n_reweight=n_reweight, blur_radius=blur_radius,
                            n_valid=n_valid, quantized_blur=quantized_blur,
                            nn_table=nn_table)


def patchcore_finish(patch, bank, min_val, min_idx, feat_hw,
                     out_size: int = 224, metric: str = "l2",
                     n_reweight: int = 3, blur_radius: float = 4.0,
                     n_valid=None, quantized_blur: bool = False,
                     nn_table=None):
    """Everything downstream of the bank min-distance pass: eq.7 reweight,
    bilinear upsample and blur.  Split out so callers with their own
    min-distance computation (the shard_map'd sharded-bank kernel path,
    parallel/eval.py) reuse the identical tail; ``min_idx=None`` re-derives
    the top patch's bank NN exactly with one matvec.

    ``nn_table`` (precomputed by ``bank_nn_table``) replaces the
    m_star-to-bank distance pass with an index lookup — one fewer full bank
    stream per sample; identical neighbour choice by construction.

    All bank touches here are one-row gathers and single matvecs — under a
    row-sharded bank GSPMD partitions them shard-local (no Mosaic involved).
    """
    s_idx = jnp.argmax(min_val)
    s_star = min_val[s_idx]

    def _mask_row(row):
        return (row if n_valid is None
                else mask_padding_cols(row[None, :], n_valid)[0])

    m_test = patch[s_idx]
    if min_idx is not None:
        m_star_idx = min_idx[s_idx]
    else:
        # jnp path tracks no argmin (the per-chunk index reduce would cost
        # as much as the min pass); one matvec re-derives it exactly
        m_star_idx = jnp.argmin(_mask_row(cdist(m_test[None, :], bank,
                                                metric)[0]))
    if nn_table is not None:
        nn_idx = nn_table[m_star_idx]
    else:
        w_dist = _mask_row(cdist(bank[m_star_idx][None, :], bank, metric)[0])
        # n_reweight smallest by iterative min-extraction — lax.top_k over a
        # ~10^5-wide row lowers to a sort costing ~7 ms on v5e; three
        # min/argmin passes are ~100x cheaper
        nn_idx = []
        wd = w_dist
        for _ in range(n_reweight):
            j = jnp.argmin(wd)
            nn_idx.append(j)
            wd = wd.at[j].set(jnp.float32(3.4e38))
        nn_idx = jnp.stack(nn_idx)
    # nn_idx[0] is m_star itself (distance 0); eq. 7 uses the remaining ones.
    m_star_knn = jnp.linalg.norm(m_test[None, :] - bank[nn_idx[1:]], axis=1)

    d_sqrt = jnp.sqrt(jnp.float32(patch.shape[1]))
    # eq.7's naive form (reference features.py:287) overflows f32 when a
    # test patch sits far from the bank (exp(s*/sqrt(D)) -> inf, inf/inf ->
    # NaN — the reference's own comment at features.py:268-270 admits the
    # hazard).  Subtract the shared max before exponentiating: identical in
    # exact arithmetic, overflow-free, and matches the reference within
    # ulps wherever the reference itself doesn't overflow.
    a = s_star / d_sqrt
    b = m_star_knn / d_sqrt
    m = jnp.maximum(a, jnp.max(b))
    w = 1.0 - jnp.exp(a - m) / jnp.sum(jnp.exp(b - m))
    s = w * s_star

    h, w_ = feat_hw
    s_map = min_val.reshape(h, w_)[..., None]
    s_map = bilinear_resize(s_map, (out_size, out_size))[..., 0]
    if quantized_blur:
        # bit-exact reference uint8 blur path (checkpoint-parity eval mode)
        from cmdiad_tpu.ops.blur import quantized_knn_gaussian_blur
        s_map = quantized_knn_gaussian_blur(s_map, blur_radius)
    else:
        s_map = knn_gaussian_blur(s_map, blur_radius)
    return s, s_map


def pad_bank(bank: jnp.ndarray, bucket: int = 8192) -> jnp.ndarray:
    """Pad bank rows up to a bucket multiple with PAD_VALUE rows (jit-cache)."""
    import numpy as np
    n = bank.shape[0]
    target = int(np.ceil(max(n, 1) / bucket) * bucket)
    if target == n:
        return bank
    pad = jnp.full((target - n, bank.shape[1]), PAD_VALUE, bank.dtype)
    return jnp.concatenate([bank, pad], axis=0)
