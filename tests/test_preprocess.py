"""Preprocessing pipeline: plane removal, DBSCAN cleaning, padding, tiff IO."""

import numpy as np
import pytest

from cmdiad_tpu.preprocess.plane import ransac_plane, remove_plane, border_points
from cmdiad_tpu.preprocess.cluster import dbscan_labels, largest_cluster_cleaning
from cmdiad_tpu.preprocess.mvtec import pad_to_square, preprocess_sample
from cmdiad_tpu.data import tiffio


def _scene(rng, h=120, w=90):
    """Organized pc: tilted plane background + blob above it + outlier tuft."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    x = xx / w * 0.5
    y = yy / h * 0.5
    z = 0.1 + 0.02 * x + 0.01 * y          # the plane z = .1 + .02x + .01y
    pc = np.stack([x, y, z], -1)
    blob = ((yy - 60) ** 2 + (xx - 45) ** 2) < 20 ** 2
    pc[blob, 2] += 0.05                     # object lifted off the plane
    tuft = ((yy - 10) ** 2 + (xx - 80) ** 2) < 3 ** 2
    pc[tuft, 2] += 0.2                      # small separated cluster
    pc += rng.normal(0, 1e-4, pc.shape)
    rgb = (rng.uniform(0, 255, (h, w, 3))).astype(np.uint8)
    return pc.astype(np.float32), rgb, blob, tuft


def test_ransac_plane_recovers_synthetic_plane(rng):
    pc, _, _, _ = _scene(rng)
    pts = border_points(pc)
    plane = ransac_plane(pts, seed=0)
    # check the known plane z = .1+.02x+.01y: normal ∝ (.02,.01,-1)
    n = plane[:3] / np.linalg.norm(plane[:3])
    expected = np.array([0.02, 0.01, -1.0])
    expected /= np.linalg.norm(expected)
    assert abs(abs(n @ expected) - 1.0) < 1e-3


def test_remove_plane_keeps_object(rng):
    pc, rgb, blob, tuft = _scene(rng)
    pc2, rgb2 = remove_plane(pc, rgb, seed=0)
    valid = np.all(pc2 != 0, axis=-1)
    assert valid[blob].mean() > 0.9        # object survives
    background = ~blob & ~tuft
    assert valid[background].mean() < 0.05  # plane removed
    assert (rgb2[~valid] == 0).all()


def test_dbscan_two_clusters(rng):
    a = rng.normal(0, 0.001, (100, 3))
    b = rng.normal(0, 0.001, (50, 3)) + 1.0
    labels = dbscan_labels(np.concatenate([a, b]), eps=0.006, min_points=10)
    assert len(set(labels[:100])) == 1
    assert len(set(labels[100:])) == 1
    assert labels[0] != labels[120]


def test_largest_cluster_cleaning(rng):
    pc, rgb, blob, tuft = _scene(rng)
    pc2, _ = remove_plane(pc, rgb, seed=0)
    pc3, rgb3, n = largest_cluster_cleaning(pc2, rgb, eps=0.02, min_points=5)
    valid = np.all(pc3 != 0, axis=-1)
    assert valid[blob].mean() > 0.8
    assert valid[tuft].sum() == 0          # the tuft is gone


def test_pad_to_square():
    x = np.ones((120, 90, 3), np.float32)
    p = pad_to_square(x)
    # side = max(roundup100(120)=200, roundup100(90)=100) = 200
    assert p.shape == (200, 200, 3)
    assert p.sum() == x.sum()
    g = pad_to_square(np.ones((50, 50)))
    assert g.shape == (100, 100)


def test_preprocess_sample_roundtrip(rng, tmp_path):
    pc, rgb, blob, _ = _scene(rng)
    from PIL import Image
    xyz_dir = tmp_path / "xyz"; rgb_dir = tmp_path / "rgb"
    xyz_dir.mkdir(); rgb_dir.mkdir()
    tiffio.imwrite(str(xyz_dir / "s.tiff"), pc)
    Image.fromarray(rgb).save(rgb_dir / "s.png")
    out = preprocess_sample(str(xyz_dir / "s.tiff"))
    assert out["pc"].shape[0] == out["pc"].shape[1]          # square
    assert out["pc"].shape[0] % 100 == 0
    back = tiffio.imread(str(xyz_dir / "s.tiff"))            # rewritten
    np.testing.assert_array_equal(back, out["pc"])


@pytest.mark.parametrize("comp", ["none", "deflate"])
def test_tiff_roundtrip(rng, tmp_path, comp):
    arr = rng.normal(size=(37, 53, 3)).astype(np.float32)
    p = str(tmp_path / "t.tiff")
    tiffio.imwrite(p, arr)
    np.testing.assert_array_equal(tiffio.imread(p), arr)


def test_tiff_reads_pil_written(rng, tmp_path):
    """Interop: PIL-written uint8 tiffs decode identically."""
    from PIL import Image
    arr = rng.integers(0, 255, (20, 30, 3)).astype(np.uint8)
    p = str(tmp_path / "pil.tiff")
    Image.fromarray(arr).save(p)
    np.testing.assert_array_equal(tiffio.imread(p), arr)
