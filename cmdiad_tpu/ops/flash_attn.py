"""Fused multi-head self-attention (softmax(q·kᵀ)·v) Pallas kernel.

Replaces the naive attention einsums in the two backbones (reference
models/models.py:148-160): at the pipeline's sequence lengths (785 ViT
tokens, 1024 point-group tokens) the (b, h, n, n) score/probability tensors
are the dominant HBM traffic of every transformer block (~15-30 MB/img/layer
at bf16) while the matmuls themselves are far from MXU-bound.

TPU design (shaped by measured Mosaic-compile behaviour on this backend —
see CLAUDE.md):
  * grid (batch·head, n // block_q): scores for a 128-query block are an
    (n_pad, 128) tile — big whole-(n, n) tiles make Mosaic compile time
    explode roughly linearly in tile vregs (28 s at (1024, 128) vs 356 s at
    (1024, 1024) measured);
  * scores are computed TRANSPOSED (keys on sublanes): the softmax max/sum
    are sublane reductions (lane reductions over non-power-of-two lane
    counts never finished compiling: n=384/896 hang, n=512 took 102 s);
  * K/V block index maps ignore the query-block grid index, so Mosaic
    fetches them once per (batch, head) and only the small q/o blocks move
    per step — HBM traffic is one pass over q, k, v, o;
  * bfloat16 inputs run a bf16 kernel with the head dim zero-padded to 128
    lanes: bf16 operands with 64-lane-minor tiles multiply compile time
    ~10-25x (270 s vs 28 s measured), while full-lane bf16 tiles compile
    FASTER than f32 (11 s) and hit the 4x bf16 MXU rate — the d-pad doubles
    the matmul FLOPs but at a quarter the cost per FLOP.  float32 inputs
    keep d=64 and f32 throughout (f32 64-lane tiles compile fine);
  * sequence padding prefers the next power of two when it is within 4/3 of
    the 128-multiple (785 -> 1024, not 896): non-power-of-two SUBLANE
    counts compile 4-20x slower (896 took 231 s in bf16, 1024 took 11 s).

Measured on the flagship pipeline (batch 8, bf16): the all-f32 variant of
this kernel LOST 12% end-to-end (85.1 vs 97.3 img/s) — the f32 MXU-rate
penalty exceeded the deleted score traffic; the bf16 variant is the one
that pays off.

Off-TPU (and with use_flash=False) an einsum fallback runs instead — the
same algorithm, but at bf16 it additionally quantizes the (b, h, n, n)
score tensor to the compute dtype before the f32 softmax (a deliberate
HBM-traffic halving on the default production path), whereas the kernel
keeps scores f32 throughout; kernel-vs-fallback parity tolerances must
budget for that extra rounding (exact agreement only at f32).  The
fallback is also the path GSPMD-partitioned multi-chip programs use on
CPU meshes; on TPU meshes the kernel runs inside shard_map like the other
Mosaic kernels (methods/base.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 128


def _attn_kernel(n_valid: int, out_dtype, precision, qt_ref, k_ref, v_ref,
                 o_ref):
    """One (batch·head, query-block): qt (1, d, bq), k/v (1, n_pad, d)."""
    qt = qt_ref[0]                                           # (d, bq)
    k = k_ref[0]                                             # (n_pad, d)
    sT = jax.lax.dot_general(k, qt, (((1,), (0,)), ((), ())),
                             precision=precision,
                             preferred_element_type=jnp.float32)  # (n_pad, bq)
    if n_valid < sT.shape[0]:
        row = jax.lax.broadcasted_iota(jnp.int32, sT.shape, 0)
        sT = jnp.where(row < n_valid, sT, -jnp.inf)
    m = jnp.max(sT, axis=0, keepdims=True)                   # sublane reduce
    p = jnp.exp(sT - m)
    p = (p / jnp.sum(p, axis=0, keepdims=True)).astype(out_dtype)
    # contraction over keys = sublanes of both p and v (Aᵀ·B form)
    o_ref[0] = jax.lax.dot_general(p, v_ref[0], (((0,), (0,)), ((), ())),
                                   precision=precision,
                                   preferred_element_type=jnp.float32
                                   ).astype(o_ref.dtype)


def _kernel_precision(dtype) -> jax.lax.Precision:
    """Mosaic rejects bf16 operands with an fp32 contract precision ("Bad
    lhs type"), so bf16 kernels always pin DEFAULT (1-pass — the production
    mode).  f32 kernels instead FOLLOW the ambient
    ``jax_default_matmul_precision``: under the test suite's float32 oracle
    mode the in-kernel dots must be as exact as the einsum fallback they
    are compared against, while production's unset default keeps the fast
    1-pass form.
    """
    if dtype == jnp.bfloat16:
        return jax.lax.Precision.DEFAULT
    ambient = jax.config.jax_default_matmul_precision
    if ambient in ("float32", "highest", "F32_F32_F32"):
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


def _flash_call(qt, k, v, n_valid: int):
    """qt (BH, d, n_pad), k/v (BH, n_pad, d) -> (BH, n_pad, d), same dtype."""
    bh, d, n_pad = qt.shape
    assert n_pad % BLOCK_Q == 0, n_pad
    return pl.pallas_call(
        functools.partial(_attn_kernel, n_valid, qt.dtype,
                          _kernel_precision(qt.dtype)),
        grid=(bh, n_pad // BLOCK_Q),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), qt.dtype),
        in_specs=[
            pl.BlockSpec((1, d, BLOCK_Q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_Q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(qt, k, v)


def _seq_pad(n: int) -> int:
    """Pad to the next power of two when within 4/3 of the 128-multiple
    (cheap compile), else to the 128-multiple (slow one-time compile)."""
    ceil128 = -(-n // BLOCK_Q) * BLOCK_Q
    pow2 = max(BLOCK_Q, 1 << (n - 1).bit_length())
    return pow2 if pow2 * 3 <= ceil128 * 4 else ceil128


def _head_pad(d: int, dtype) -> int:
    """Head-dim the kernel actually runs: bf16 tiles must be full-lane
    (64-lane-minor bf16 is a measured ~10x Mosaic compile cliff); f32
    handles d=64 minors fine.  bench.py's FLOPs correction imports this so
    its padded-matmul accounting cannot drift from the kernel."""
    return (-(-d // 128) * 128) if jnp.dtype(dtype) == jnp.bfloat16 else d


def fused_attention(q, k, v, scale: float, use_flash: bool = True):
    """Multi-head attention: q, k, v (B, N, H, D) -> (B, N, H, D).

    Computes softmax((q·scale)·kᵀ)·v per head — the reference Attention
    (models/models.py:148-160) without dropout (inference-only backbones).
    ``use_flash`` routes to the Pallas kernel on TPU; anywhere else the
    einsum fallback below runs (same algorithm; at bf16 it quantizes the
    score tensor to the compute dtype before the f32 softmax, which the
    kernel does not — see module docstring).
    """
    b, n, h, d = q.shape
    if not use_flash or jax.default_backend() != "tpu":
        # f32-accumulated scores stored in the compute dtype (halves the
        # block's HBM-dominant (b, h, n, n) traffic at bf16); softmax still
        # reduces in f32.
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k,
                          preferred_element_type=jnp.float32).astype(q.dtype)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        return jnp.einsum("bhnm,bmhd->bnhd", attn, v)

    n_pad = _seq_pad(n)
    d_pad = _head_pad(d, q.dtype)

    def to_heads(x):
        x = x.transpose(0, 2, 1, 3).reshape(b * h, n, d)
        return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, d_pad - d)))

    qt = to_heads(q * jnp.asarray(scale, q.dtype)).transpose(0, 2, 1)
    o = _flash_call(qt, to_heads(k), to_heads(v), n)
    return (o[:, :n, :d].reshape(b, h, n, d).transpose(0, 2, 1, 3)
            .astype(q.dtype))
