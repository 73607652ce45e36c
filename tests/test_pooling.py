"""Pooling/resize ops vs torch oracles (exact-semantics parity layer)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from cmdiad_tpu.ops import pooling


def _t(x_hwc):  # (H,W,C) numpy -> (1,C,H,W) torch
    return torch.from_numpy(np.ascontiguousarray(x_hwc.transpose(2, 0, 1)))[None]


def _back(t):  # (1,C,h,w) torch -> (h,w,C) numpy
    return t[0].numpy().transpose(1, 2, 0)


@pytest.mark.parametrize("n_in,n_out", [(28, 56), (222, 56), (222, 28), (224, 224)])
def test_adaptive_avg_pool_matches_torch(rng, n_in, n_out):
    x = rng.normal(size=(n_in, n_in, 5)).astype(np.float32)
    ours = np.asarray(pooling.adaptive_avg_pool(x, n_out))
    ref = _back(torch.nn.AdaptiveAvgPool2d((n_out, n_out))(_t(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n_in,n_out", [(28, 224), (56, 224), (17, 64)])
def test_bilinear_matches_torch(rng, n_in, n_out):
    x = rng.normal(size=(n_in, n_in, 3)).astype(np.float32)
    ours = np.asarray(pooling.bilinear_resize(x, n_out))
    ref = _back(F.interpolate(_t(x), size=(n_out, n_out), mode="bilinear",
                              align_corners=False))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("n_in,n_out", [(56, 224), (14, 56)])
def test_bicubic_matches_torch(rng, n_in, n_out):
    x = rng.normal(size=(n_in, n_in, 3)).astype(np.float32)
    ours = np.asarray(pooling.bicubic_resize(x, n_out))
    ref = _back(F.interpolate(_t(x), size=(n_out, n_out), mode="bicubic",
                              align_corners=False))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("n_in,n_out", [(400, 224), (224, 224), (100, 224)])
def test_nearest_matches_torch(rng, n_in, n_out):
    x = rng.normal(size=(n_in, n_in, 3)).astype(np.float32)
    ours = np.asarray(pooling.nearest_resize(x, n_out))
    ref = _back(F.interpolate(_t(x), size=(n_out, n_out), mode="nearest"))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=0)
    ours_np = pooling.nearest_resize_np(x, n_out)
    np.testing.assert_allclose(ours_np, ref, rtol=0, atol=0)


def test_avg_pool_3x3_valid(rng):
    x = rng.normal(size=(24, 24, 4)).astype(np.float32)
    ours = np.asarray(pooling.avg_pool_3x3_valid(x))
    ref = _back(torch.nn.AvgPool2d(3, stride=1)(_t(x)))
    assert ours.shape == (22, 22, 4)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_avg3x3_then_adaptive_fused_matches_sequential(rng):
    """The fused separable operator must equal 3x3-valid avg followed by
    torch adaptive pooling (the hot xyz-splat path uses it at 224 -> 56)."""
    x = rng.normal(size=(2, 48, 48, 4)).astype(np.float32)
    fused = np.asarray(pooling.avg3x3_then_adaptive_pool(x, 12))
    seq = np.asarray(pooling.adaptive_avg_pool(
        pooling.avg_pool_3x3_valid(x), 12))
    ref = _back(torch.nn.AdaptiveAvgPool2d(12)(
        torch.nn.AvgPool2d(3, stride=1)(_t(x.reshape(-1, 48, 48, 4)[0]))))
    np.testing.assert_allclose(fused, seq, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(fused[0], ref, rtol=1e-4, atol=1e-5)
