"""DualBackbone integration: shapes, masking and patch assembly."""

import numpy as np
import jax.numpy as jnp

from cmdiad_tpu.models.backbone import DualBackbone
from cmdiad_tpu.models.vit import ViTConfig
from cmdiad_tpu.models.point_mae import PointMAEConfig


def _small_backbone():
    bb = DualBackbone.__new__(DualBackbone)
    from cmdiad_tpu.models.vit import VisionTransformer
    from cmdiad_tpu.models.point_mae import PointTransformer
    bb.dtype = jnp.float32
    bb.vit_config = ViTConfig(img_size=32, patch_size=8, embed_dim=16,
                              depth=1, num_heads=2)
    bb.pm_config = PointMAEConfig(num_group=8, group_size=4, encoder_dims=8,
                                  trans_dim=8, depth=2, num_heads=2,
                                  fetch_idx=(0, 1))
    bb.vit = VisionTransformer(bb.vit_config)
    bb.point = PointTransformer(bb.pm_config)
    bb.use_pallas = False
    bb.image_size = 32
    bb.point_capacity = None
    return bb


def test_dual_backbone_shapes(rng):
    bb = _small_backbone()
    params = bb.init_params(0)
    img = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    pc = rng.normal(size=(2, 32, 32, 3)).astype(np.float32) * 0.1
    pc[:, :8] = 0.0  # masked rows
    out = bb.extract(params, img, jnp.asarray(pc), with_2828=True)

    g = bb.vit_config.grid
    assert out["rgb_patch"].shape == (2, g * g, 16)
    assert out["rgb_patch2"].shape == (2, 56 * 56, 16)
    assert out["xyz_patch"].shape == (2, 56 * 56, 16)  # 2 fetch layers * 8
    assert out["xyz_patch_2828"].shape == (2, 28 * 28, 16)
    assert out["centers"].shape == (2, 8, 3)
    assert out["ori_idx"].shape == (2, 8, 4)
    for v in out.values():
        assert bool(jnp.isfinite(v).all())


def test_rgb_patch_row_major_layout(rng):
    """rgb_patch must be the 28x28 grid flattened row-major (features.py:162)."""
    bb = _small_backbone()
    params = bb.init_params(0)
    img = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    patch, _ = bb.rgb_patches(params, img)
    grid = bb.vit.apply(params["vit"], img)
    g = bb.vit_config.grid
    # jit vs eager fusion can differ in last-ulp float ordering
    np.testing.assert_allclose(
        np.asarray(patch[0]).reshape(g, g, -1), np.asarray(grid[0]),
        rtol=1e-5, atol=1e-6)
