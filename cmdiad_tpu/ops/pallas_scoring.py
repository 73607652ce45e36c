"""Fused memory-bank min-distance Pallas kernel.

The PatchCore hot loop is ``min over bank of ||q - b||`` for 3136 query
patches against up to ~10^5 bank rows.  The jnp path materialises the
(Np, Nb) distance matrix in HBM (822 MB at Nb=65k) and runs ~12.9 ms; this
kernel streams bank tiles through VMEM, computes the -2·Q·Bᵀ term on the MXU
in bfloat16 with f32 accumulation, and keeps a running (min, argmin) in VMEM
scratch — the distance matrix never exists.

Layout: distances are computed transposed, (TILE_bank, Np), so the reduction
over bank rows is a sublane reduction leaving a lane-major (1, Np) running
state.  Tie-breaking matches jnp.argmin (first occurrence) because the
running update is a strict '<'.

This is the "fused cdist+top-k" kernel called for by the project north star
(BASELINE.json); the k=1(+argmin) case is what scoring needs — the eq.7
reweight's k=3 runs on one bank row downstream and stays in jnp.

``compute_dtype='int8'`` (cfg.dist_method_s='l2_int8') quantises both
operands per row to int8 and runs the cross term as s8 x s8 -> s32 — the
v5e MXU's int8 peak is 2x bf16 and this kernel is compute-bound above ~32k
rows.  Norm terms stay exact f32.

**Exact refinement (round 5, default on):** the kernel's quantised cross
term (bf16 ~0.4%/element, int8 ~0.5%/element, and ABSOLUTE — proportional
to row magnitudes, not to the distance, so unbounded in relative terms for
patches (nearly) coincident with a bank row: min distance ~0, the
normal-patch regime that dominates s_map; measured raw worst-case ~5-8% of
the patch row norm at exact coincidence) only SELECTS the argmin row; the
returned min VALUE is then recomputed exactly in f32 from the selected row
via the cancellation-free elementwise (p-b)² form — one (Np, D) row gather
+ reduce, ~40 µs/img vs the ~2 ms bank pass.  The residual error is pure
selection error: when quantisation flips the argmin between near-tied rows
the reported distance is the true distance of a near-tie (bounded by 2x
the raw cross-term envelope, and usually far less).  Raw-kernel envelopes
are pinned by tests/test_blur_scoring.py::test_pallas_min_dist_int8_*
(refine=False); the refined path's collapse of the near-duplicate error is
tested next to them, and the metric-level consequence on-chip by
test_tpu_only.test_int8_end_metric_delta.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _quantize_rows(x: jnp.ndarray):
    """Symmetric per-row int8 quantisation: (N, D) f32 -> (int8, (N, 1) f32
    scale).  Row-wise scales keep the quantisation error of the -2·q·bᵀ
    cross term relative to each row's own magnitude; the |q|²/|b|² norm
    terms stay exact f32 (computed from the unquantised rows), so the only
    approximation in d² is the cross term — same structure as the bf16
    kernel, with int8's ~0.4%/element rounding in place of bf16's."""
    amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    scale = jnp.maximum(amax, 1e-30) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _kernel_int8(nq, tile, patch_ref, pnorm_ref, pscale_ref, bank_ref,
                 bnorm_ref, bscale_ref, minv_ref, mini_ref, run_v, run_i):
    """int8 variant: s8 x s8 -> s32 on the MXU (2x the bf16 peak on v5e),
    dequantised by the per-row scale outer product on the VPU."""
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        run_v[0, :] = jnp.full((nq,), 3.4e38, jnp.float32)
        run_i[0, :] = jnp.zeros((nq,), jnp.int32)

    prod = jnp.dot(bank_ref[:, :], patch_ref[:, :],
                   precision=jax.lax.Precision.DEFAULT,
                   preferred_element_type=jnp.int32)            # (TILE, Nq)
    prod_f = prod.astype(jnp.float32) * (bscale_ref[:, :]
                                         * pscale_ref[:, :])    # dequantise
    d2 = bnorm_ref[:, :] - 2.0 * prod_f
    tile_min = jnp.min(d2, axis=0)
    tile_arg = jnp.argmin(d2, axis=0).astype(jnp.int32) + i * tile

    prev_v = run_v[0, :]
    take = tile_min < prev_v
    run_v[0, :] = jnp.where(take, tile_min, prev_v)
    run_i[0, :] = jnp.where(take, tile_arg, run_i[0, :])

    @pl.when(i == n_steps - 1)
    def _():
        minv_ref[0, :] = run_v[0, :] + pnorm_ref[0, :]
        mini_ref[0, :] = run_i[0, :]


def _kernel(nq, tile, patch_ref, pnorm_ref, bank_ref, bnorm_ref,
            minv_ref, mini_ref, run_v, run_i):
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        run_v[0, :] = jnp.full((nq,), 3.4e38, jnp.float32)
        run_i[0, :] = jnp.zeros((nq,), jnp.int32)

    # d2 = |b|^2 - 2 b.q  (the |q|^2 row-constant is added by the caller;
    # it cannot change the argmin)
    # precision pinned: Mosaic rejects bf16 operands with an fp32 contract
    # precision, which jax_default_matmul_precision=float32 (the test
    # suite's TPU oracle mode) would otherwise inject here
    prod = jnp.dot(bank_ref[:, :], patch_ref[:, :],
                   precision=jax.lax.Precision.DEFAULT,
                   preferred_element_type=jnp.float32)       # (TILE, Nq)
    d2 = bnorm_ref[:, :] - 2.0 * prod                        # (TILE, Nq)
    tile_min = jnp.min(d2, axis=0)                           # (Nq,)
    tile_arg = jnp.argmin(d2, axis=0).astype(jnp.int32) + i * tile

    prev_v = run_v[0, :]
    take = tile_min < prev_v
    run_v[0, :] = jnp.where(take, tile_min, prev_v)
    run_i[0, :] = jnp.where(take, tile_arg, run_i[0, :])

    @pl.when(i == n_steps - 1)
    def _():
        minv_ref[0, :] = run_v[0, :] + pnorm_ref[0, :]
        mini_ref[0, :] = run_i[0, :]


def _exact_refine(patch_f32: jnp.ndarray, bank: jnp.ndarray,
                  min_idx: jnp.ndarray) -> jnp.ndarray:
    """Exact f32 distance of each patch row to its SELECTED bank row.

    Elementwise (p-b)² form on purpose: the a²+b²-2ab identity both
    reintroduces the cancellation error this refinement exists to remove
    and hits the known XLA:TPU fusion-emitter crash for batched dots over
    gathered operands (CLAUDE.md); the diff form is a gather + reduce,
    non-negative by construction."""
    sel = jnp.take(bank, min_idx, axis=0).astype(jnp.float32)  # (Np, D)
    diff = patch_f32 - sel
    return jnp.sqrt(jnp.sum(diff * diff, axis=1))


@functools.partial(jax.jit, static_argnames=("tile", "compute_dtype",
                                             "refine"))
def bank_min_dist_pallas(patch: jnp.ndarray, bank: jnp.ndarray,
                         tile: int = 1024, compute_dtype: str = "bfloat16",
                         refine: bool = True):
    """(min euclidean distance, argmin) of each patch row over the bank.

    Args:
      patch: (Np, D) float32 (Np a multiple of 128 after padding here).
      bank:  (Nb, D) float32, Nb a multiple of ``tile``.
      refine: recompute the min value exactly in f32 for the selected row
        (see module docstring) — the quantised product then only picks the
        row.  Default on; False exposes the raw kernel values (envelope
        tests, and the measured-raw-caveat documentation they pin).
    Returns:
      (min_val (Np,) float32, min_idx (Np,) int32) — with ``refine`` the
      value equals ops.scoring.bank_min_dist's exact f32 distance for the
      selected row; the selection itself matches within the quantised
      product's near-tie envelope.
    """
    nq_orig, d = patch.shape
    nb = bank.shape[0]
    assert nb % tile == 0, (nb, tile)

    nq = -(-nq_orig // 128) * 128
    patch_f32 = patch.astype(jnp.float32)
    patch_p = jnp.pad(patch_f32, ((0, nq - nq_orig), (0, 0)))
    pnorm = jnp.sum(patch_p * patch_p, axis=1)[None, :]       # (1, Nq) f32
    bnorm = jnp.sum(bank.astype(jnp.float32) * bank.astype(jnp.float32),
                    axis=1)[:, None]                          # (Nb, 1) f32

    if compute_dtype == "int8":
        mv, mi = _bank_min_dist_int8(patch_p, pnorm, bank, bnorm,
                                     nq_orig, nq, tile)
        if refine:
            mv = _exact_refine(patch_f32, bank, mi)
        return mv, mi
    cdt = jnp.dtype(compute_dtype)

    minv, mini = pl.pallas_call(
        functools.partial(_kernel, nq, tile),
        grid=(nb // tile,),
        in_specs=[
            pl.BlockSpec((d, nq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),            # patch.T
            pl.BlockSpec((1, nq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),            # |q|^2
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),            # bank tile
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),            # |b|^2 tile
        ],
        out_specs=(
            pl.BlockSpec((1, nq), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, nq), jnp.float32),
            jax.ShapeDtypeStruct((1, nq), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, nq), jnp.float32),
            pltpu.VMEM((1, nq), jnp.int32),
        ],
        # Mosaic's default scoped-VMEM budget (16 MiB) is sized far below
        # the 128 MiB physical VMEM of a v5e core; the whole-array patch
        # block costs ~5 MiB per in-flight instance, so batched (vmapped)
        # callers need the real budget.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(patch_p.T.astype(cdt), pnorm, bank.astype(cdt), bnorm)

    mi = mini[0, :nq_orig]
    if refine:
        min_val = _exact_refine(patch_f32, bank, mi)
    else:
        min_val = jnp.sqrt(jnp.maximum(minv[0, :nq_orig], 0.0))
    return min_val, mi


def _bank_min_dist_int8(patch_p, pnorm, bank, bnorm, nq_orig, nq, tile):
    """int8 scoring pass (cfg.score_int8): quantise both operands per row on
    device (one extra bank stream per dispatch — ~0.15 ms at 65k rows,
    amortised over the batch since XLA hoists the bank quantisation out of
    the vmap) and run the s8 x s8 -> s32 kernel.  v5e int8 MXU peak is 2x
    bf16, and the production kernel is compute-bound above ~32k rows
    (CLAUDE.md: bank streaming is ~0.12 ms vs ~1.6 ms of bf16 matmul at the
    65k flagship bank), so the cross-term dot — the kernel's entire cost —
    halves.  The |q|²/|b|² terms stay exact f32."""
    pq, pscale = _quantize_rows(patch_p)                      # (Nq, D) s8
    bq, bscale = _quantize_rows(bank.astype(jnp.float32))     # (Nb, D) s8

    minv, mini = pl.pallas_call(
        functools.partial(_kernel_int8, nq, tile),
        grid=(bank.shape[0] // tile,),
        in_specs=[
            pl.BlockSpec((patch_p.shape[1], nq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),            # patch.T s8
            pl.BlockSpec((1, nq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),            # |q|^2
            pl.BlockSpec((1, nq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),            # q row scales
            pl.BlockSpec((tile, patch_p.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),            # bank tile s8
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),            # |b|^2 tile
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),            # b row scales
        ],
        out_specs=(
            pl.BlockSpec((1, nq), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, nq), jnp.float32),
            jax.ShapeDtypeStruct((1, nq), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, nq), jnp.float32),
            pltpu.VMEM((1, nq), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(pq.T, pnorm, pscale.T, bq, bnorm, bscale)

    min_val = jnp.sqrt(jnp.maximum(minv[0, :nq_orig], 0.0))
    return min_val, mini[0, :nq_orig]
