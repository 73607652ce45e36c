"""Native C++ runtime vs the pure-Python reference implementations."""

import numpy as np
import pytest

from cmdiad_tpu import native
from cmdiad_tpu.data import tiffio

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native toolchain unavailable")


def test_native_tiff_decode_matches_python(rng, tmp_path):
    arr = rng.normal(size=(48, 57, 3)).astype(np.float32)
    p = str(tmp_path / "x.tiff")
    tiffio.imwrite(p, arr)
    with open(p, "rb") as f:
        data = f.read()
    out = native.tiff_decode(data)
    np.testing.assert_array_equal(out, arr)


def test_native_tiff_rejects_compressed(rng, tmp_path):
    # deflate-compressed tiffs must fall back to python (probe returns None)
    import struct, zlib
    arr = rng.normal(size=(8, 8, 3)).astype(np.float32)
    p = str(tmp_path / "c.tiff")
    tiffio.imwrite(p, arr)
    with open(p, "rb") as f:
        data = bytearray(f.read())
    # flip the compression tag (259) value to 8 in place
    n_tags = struct.unpack_from("<H", data, 8)[0]
    for i in range(n_tags):
        base = 10 + i * 12
        tag = struct.unpack_from("<H", data, base)[0]
        if tag == 259:
            struct.pack_into("<I", data, base + 8, 8)
    assert native.tiff_decode(bytes(data)) is None


def test_native_nearest_resize(rng):
    src = rng.normal(size=(40, 30, 3)).astype(np.float32)
    out = native.nearest_resize(src, 224, 224)
    from cmdiad_tpu.ops.pooling import nearest_resize_np
    np.testing.assert_array_equal(out, nearest_resize_np(src, 224))


def test_native_ransac_plane(rng):
    n = 5000
    xy = rng.uniform(-1, 1, (n, 2))
    z = 0.3 + 0.05 * xy[:, 0] - 0.02 * xy[:, 1] + rng.normal(0, 5e-4, n)
    pts = np.column_stack([xy, z]).astype(np.float32)
    plane = native.ransac_plane(pts, dist_threshold=0.004, seed=0)
    nrm = plane[:3] / np.linalg.norm(plane[:3])
    expected = np.array([0.05, -0.02, -1.0])
    expected /= np.linalg.norm(expected)
    assert abs(abs(nrm @ expected) - 1.0) < 1e-3


def test_native_dbscan_matches_python(rng):
    a = rng.normal(0, 0.001, (200, 3)).astype(np.float32)
    b = (rng.normal(0, 0.001, (80, 3)) + 0.5).astype(np.float32)
    noise = (rng.uniform(-1, 1, (5, 3)) * 10).astype(np.float32)
    pts = np.concatenate([a, b, noise])
    got = native.dbscan(pts, eps=0.006, min_points=10)
    from cmdiad_tpu.preprocess.cluster import dbscan_labels
    ref = dbscan_labels(pts, eps=0.006, min_points=10, prefer_native=False)
    # same partition (labels may be permuted)
    assert (got == -1).sum() == (ref == -1).sum()
    for lab in set(ref[ref >= 0]):
        members = np.flatnonzero(ref == lab)
        assert len(set(got[members])) == 1


def test_native_dbscan_scales(rng):
    import time
    pts = rng.normal(0, 0.05, (200000, 3)).astype(np.float32)
    t0 = time.perf_counter()
    labels = native.dbscan(pts, eps=0.006, min_points=30)
    dt = time.perf_counter() - t0
    assert labels.shape == (200000,)
    assert dt < 30.0, f"native dbscan too slow: {dt:.1f}s"
