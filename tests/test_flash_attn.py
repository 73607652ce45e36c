"""Fused-attention kernel vs einsum fallback and numpy oracle.

The Pallas path runs in interpreter mode on CPU (identical program text to
the TPU kernel, compiled execution covered by tests/test_tpu_only.py); the
einsum fallback is the same math XLA-fused.  Odd sequence lengths exercise
the pad-to-128 + key-row masking path (ViT runs at N=785).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cmdiad_tpu.ops.flash_attn import fused_attention, _flash_call, BLOCK_Q


def _np_mha(q, k, v, scale):
    s = np.einsum("bnhd,bmhd->bhnm", q * scale, k).astype(np.float64)
    s = s - s.max(-1, keepdims=True)
    p = np.exp(s)
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhnm,bmhd->bnhd", p, v)


def _kernel_path(q, k, v, scale):
    b, n, h, d = q.shape
    n_pad = -(-n // BLOCK_Q) * BLOCK_Q

    def th(x, s=None):
        if s is not None:
            x = x * s
        x = x.transpose(0, 2, 1, 3).reshape(b * h, n, d)
        return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))

    o = _flash_call(th(q, scale).transpose(0, 2, 1), th(k), th(v), n)
    return np.asarray(o[:, :n].reshape(b, h, n, d).transpose(0, 2, 1, 3))


@pytest.mark.parametrize("n", [64, 135, 785])
def test_flash_attention_matches_oracle(rng, n):
    b, h, d = 2, 3, 32
    q, k, v = [jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
               for _ in range(3)]
    scale = d ** -0.5
    oracle = _np_mha(np.asarray(q), np.asarray(k), np.asarray(v), scale)

    fallback = np.asarray(fused_attention(q, k, v, scale, use_flash=False))
    np.testing.assert_allclose(fallback, oracle, rtol=2e-5, atol=2e-5)

    kernel = _kernel_path(q, k, v, scale)
    np.testing.assert_allclose(kernel, oracle, rtol=2e-5, atol=2e-5)


def test_flash_attention_padded_keys_get_zero_weight(rng):
    """Key-row masking: the kernel masks score rows >= n_valid, so zero-pad
    inputs must not change the valid rows' outputs."""
    b, n, h, d = 1, 100, 2, 16
    q, k, v = [jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
               for _ in range(3)]
    out = _kernel_path(q, k, v, d ** -0.5)
    oracle = _np_mha(np.asarray(q), np.asarray(k), np.asarray(v), d ** -0.5)
    np.testing.assert_allclose(out, oracle, rtol=2e-5, atol=2e-5)


def test_flash_attention_bf16_dpad_path(rng):
    """bf16 inputs take the d-padded (64 -> 128 lanes) kernel variant with
    pow2 sequence padding (785 -> 1024) — the flagship TPU configuration;
    verify the zero-padded lanes/rows change nothing vs the f64 oracle
    within bf16 resolution."""
    b, n, h, d = 1, 785, 2, 64
    q, k, v = [jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32),
                           dtype=jnp.bfloat16) for _ in range(3)]
    out = np.asarray(fused_attention(q, k, v, d ** -0.5, use_flash=True),
                     np.float32)
    oracle = _np_mha(np.asarray(q, np.float32), np.asarray(k, np.float32),
                     np.asarray(v, np.float32), d ** -0.5)
    np.testing.assert_allclose(out, oracle, rtol=0.05, atol=0.05)


def test_seq_pad_prefers_cheap_compiles():
    from cmdiad_tpu.ops.flash_attn import _seq_pad
    assert _seq_pad(785) == 1024   # pow2 within 4/3 of 896 -> cheap compile
    assert _seq_pad(1025) == 1152  # pow2 2048 too far from 1152
    assert _seq_pad(128) == 128
    assert _seq_pad(64) == 128
