"""Torch-compatible pooling / resize primitives, built MXU-friendly.

The reference leans on four torch spatial ops whose exact semantics matter for
numerical parity (SURVEY.md §7 "hard parts"):

  * ``nn.AvgPool2d(3, stride=1)``            (features.py:72)   — VALID 3x3 mean
  * ``nn.AdaptiveAvgPool2d((56,56)/(28,28))`` (features.py:73-74)
  * ``F.interpolate(mode='bilinear')``        (features.py:294)  — align_corners=False
  * ``F.interpolate(mode='bicubic')``         (hallucination_network.py:172,204)
    — torch uses the Keys kernel with A=-0.75
  * ``F.interpolate(mode='nearest')``         (mvtec3d_util.py:17)

Instead of translating torch's gather-based kernels, each resize here is a
pair of small dense matrices applied along H then W — static-shape matmuls
that XLA tiles straight onto the MXU and fuses with neighbouring elementwise
work.  The matrices are built once in numpy and closed over as constants.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------------------
# resize matrices
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _adaptive_avg_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) row-stochastic matrix of torch AdaptiveAvgPool1d bins.

    torch semantics: bin i covers [floor(i*In/Out), ceil((i+1)*In/Out)).
    """
    m = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        start = (i * n_in) // n_out
        end = -((-(i + 1) * n_in) // n_out)  # ceil
        m[i, start:end] = 1.0 / (end - start)
    return m


def _cubic_kernel(x: np.ndarray, a: float) -> np.ndarray:
    """Keys cubic convolution kernel with free parameter ``a`` (torch: -0.75)."""
    ax = np.abs(x)
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax**3 - (a + 3.0) * ax**2 + 1.0,
        np.where(ax < 2.0, a * ax**3 - 5.0 * a * ax**2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )
    return w.astype(np.float64)


@functools.lru_cache(maxsize=None)
def _interp_matrix(n_in: int, n_out: int, mode: str) -> np.ndarray:
    """(n_out, n_in) matrix reproducing torch F.interpolate along one axis.

    align_corners=False half-pixel mapping: src = (dst + 0.5) * In/Out - 0.5,
    with index clamping at the borders (replicates torch's edge handling).
    """
    scale = n_in / n_out
    dst = np.arange(n_out, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    m = np.zeros((n_out, n_in), np.float64)
    if mode == "bilinear":
        i0 = np.floor(src).astype(np.int64)
        frac = src - i0
        lo = np.clip(i0, 0, n_in - 1)
        hi = np.clip(i0 + 1, 0, n_in - 1)
        m[np.arange(n_out), lo] += 1.0 - frac
        m[np.arange(n_out), hi] += frac
    elif mode == "bicubic":
        i0 = np.floor(src).astype(np.int64)
        frac = src - i0
        for t in range(-1, 3):
            w = _cubic_kernel(frac - t, a=-0.75)
            idx = np.clip(i0 + t, 0, n_in - 1)
            for j in range(n_out):
                m[j, idx[j]] += w[j]
    elif mode == "nearest":
        # torch 'nearest': src index = floor(dst * In/Out)
        idx = np.minimum((dst * scale).astype(np.int64), n_in - 1)
        m[np.arange(n_out), idx] = 1.0
    else:
        raise ValueError(mode)
    return m.astype(np.float32)


def _apply_separable(x: jnp.ndarray, mh: np.ndarray, mw: np.ndarray) -> jnp.ndarray:
    """Apply (Ho,Hi) and (Wo,Wi) matrices to the H/W axes of (..., H, W, C)."""
    mh_j = jnp.asarray(mh, x.dtype)
    mw_j = jnp.asarray(mw, x.dtype)
    x = jnp.einsum("oh,...hwc->...owc", mh_j, x)
    x = jnp.einsum("ow,...hwc->...hoc", mw_j, x)
    return x


# ---------------------------------------------------------------------------
# public ops (all channels-last: (..., H, W, C))
# ---------------------------------------------------------------------------

def adaptive_avg_pool(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """torch nn.AdaptiveAvgPool2d for channels-last inputs."""
    oh, ow = (out_hw, out_hw) if isinstance(out_hw, int) else out_hw
    return _apply_separable(
        x, _adaptive_avg_matrix(x.shape[-3], oh), _adaptive_avg_matrix(x.shape[-2], ow))


def bilinear_resize(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=False)."""
    oh, ow = (out_hw, out_hw) if isinstance(out_hw, int) else out_hw
    return _apply_separable(
        x, _interp_matrix(x.shape[-3], oh, "bilinear"), _interp_matrix(x.shape[-2], ow, "bilinear"))


def bicubic_resize(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """torch F.interpolate(mode='bicubic', align_corners=False)  (A=-0.75)."""
    oh, ow = (out_hw, out_hw) if isinstance(out_hw, int) else out_hw
    return _apply_separable(
        x, _interp_matrix(x.shape[-3], oh, "bicubic"), _interp_matrix(x.shape[-2], ow, "bicubic"))


def nearest_resize(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') — floor index mapping."""
    oh, ow = (out_hw, out_hw) if isinstance(out_hw, int) else out_hw
    ih, iw = x.shape[-3], x.shape[-2]
    ridx = np.minimum((np.arange(oh) * (ih / oh)).astype(np.int64), ih - 1)
    cidx = np.minimum((np.arange(ow) * (iw / ow)).astype(np.int64), iw - 1)
    return x[..., ridx, :, :][..., :, cidx, :]


def avg_pool_3x3_valid(x: jnp.ndarray) -> jnp.ndarray:
    """torch nn.AvgPool2d(3, stride=1): VALID padding, H,W -> H-2,W-2."""
    w = lax.reduce_window(
        x, 0.0, lax.add,
        window_dimensions=(1,) * (x.ndim - 3) + (3, 3, 1),
        window_strides=(1,) * x.ndim,
        padding="VALID")
    return w / 9.0


@functools.lru_cache(maxsize=None)
def _pool3x3_adaptive_matrix(n_in: int, n_out: int) -> np.ndarray:
    """1-D operator for AdaptiveAvgPool(n_in-2 -> n_out) ∘ 3-wide stride-1
    VALID average — both pools are separable per axis, so the composition
    is one (n_out, n_in) banded matrix per axis."""
    a3 = np.zeros((n_in - 2, n_in), np.float32)
    idx = np.arange(n_in - 2)
    for t in range(3):
        a3[idx, idx + t] = 1.0 / 3.0
    return (_adaptive_avg_matrix(n_in - 2, n_out) @ a3).astype(np.float32)


def avg3x3_then_adaptive_pool(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """``avg_pool_3x3_valid`` then ``adaptive_avg_pool(out_hw)`` fused into
    ONE separable matmul pair: exactly the same linear map (up to fp
    association), but the (H-2, W-2) intermediate — and the layout copy XLA
    inserts in front of reduce_window — never materialise.  On the hot
    xyz-splat path that intermediate is (B, 222, 222, 768)."""
    oh, ow = (out_hw, out_hw) if isinstance(out_hw, int) else out_hw
    return _apply_separable(x, _pool3x3_adaptive_matrix(x.shape[-3], oh),
                            _pool3x3_adaptive_matrix(x.shape[-2], ow))


def nearest_resize_np(a: np.ndarray, out_hw) -> np.ndarray:
    """Host-side torch-nearest resize for (H, W, C) numpy arrays (loader path).

    Mirrors mvtec3d_util.resize_organized_pc (F.interpolate mode='nearest').
    """
    oh, ow = (out_hw, out_hw) if isinstance(out_hw, int) else out_hw
    ih, iw = a.shape[0], a.shape[1]
    ridx = np.minimum((np.arange(oh) * (ih / oh)).astype(np.int64), ih - 1)
    cidx = np.minimum((np.arange(ow) * (iw / ow)).astype(np.int64), iw - 1)
    return a[ridx][:, cidx]
