"""DualBackbone: the jitted feature-extraction front end.

Bundles the frozen ViT (RGB) and Point-MAE (XYZ) backbones together with the
reference's patch-assembly logic into pure jittable functions:

  rgb_patches   models/models.py:35-53 + features.py:160-167
                -> rgb_patch  (B, 784, 768)   28x28 ViT grid, row-major
                -> rgb_patch2 (B, 3136, 768)  grid adaptive-avg-pooled to 56²
  xyz_patches   models/models.py:325-373 + pointnet2_utils.py:45-75 +
                features.py:169-184
                -> xyz_patch  (B, 3136, 768)  3-NN-interpolated group features
                   splatted onto the 224² grid, 3x3 VALID avg-pooled (->222²),
                   adaptive-avg-pooled to 56²
                -> optional 28² variant (features.py:179-182, used by the
                   rgb+fxyz feature dumper)

Everything runs as one XLA program per modality; there are no host
round-trips between the backbone and the patch assembly (the reference
crosses the GPU/CPU boundary twice per sample, features.py:127-140).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from cmdiad_tpu.models.vit import VisionTransformer, ViTConfig, VIT_CONFIGS
from cmdiad_tpu.models.point_mae import (
    PointTransformer, PointMAEConfig, group_points)
from cmdiad_tpu.ops.masked import nonzero_point_mask
from cmdiad_tpu.ops.interpolate import three_nn_interpolate
from cmdiad_tpu.ops.pooling import (avg3x3_then_adaptive_pool,
                                    adaptive_avg_pool)


class DualBackbone:
    """Frozen rgb+xyz feature extractor (reference models/models.Model)."""

    def __init__(self, rgb_backbone_name: str = "vit_base_patch8_224_dino",
                 num_group: int = 1024, group_size: int = 128,
                 compute_dtype: str = "float32", use_pallas: bool = True,
                 image_size: int = 224, vit_config: Optional[ViTConfig] = None,
                 pm_config: Optional[PointMAEConfig] = None,
                 point_capacity: Optional[int] = 32768,
                 use_flash: bool = False):
        self.dtype = jnp.dtype(compute_dtype)
        self.vit_config = vit_config or VIT_CONFIGS[rgb_backbone_name]
        self.pm_config = pm_config or PointMAEConfig(num_group=num_group,
                                                     group_size=group_size)
        # compact valid points to a dense prefix before FPS/KNN when the
        # grid has more cells than this (exactly equivalent, ~P/capacity x
        # faster sequential kernels); None disables
        self.point_capacity = point_capacity
        # use_flash routes attention through the fused Pallas kernel
        # (ops/flash_attn.py) — separate from use_pallas because its Mosaic
        # compile cost is large (~30-60 s per program, one-time per shape
        # with the persistent cache); the modules still fall back to einsums
        # off-TPU at trace time
        self.vit = VisionTransformer(self.vit_config, dtype=self.dtype,
                                     use_flash=use_flash)
        self.point = PointTransformer(self.pm_config, dtype=self.dtype,
                                      use_flash=use_flash)
        self.use_pallas = use_pallas
        self.use_flash = use_flash
        self.image_size = image_size

    # ---- init -------------------------------------------------------------
    def init_params(self, seed: int = 0):
        """Random params (shape-compatible with converted checkpoints)."""
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        s = self.image_size
        rgb = jnp.zeros((1, s, s, 3), self.dtype)
        vit_vars = self.vit.init(k1, rgb)
        g, m = self.pm_config.num_group, self.pm_config.group_size
        p = self.image_size * self.image_size
        pm_vars = self.point.init(k2, jnp.zeros((1, p, 3)),
                                  jnp.zeros((1, g, 3)),
                                  jnp.zeros((1, g, m), jnp.int32))
        return {"vit": vit_vars, "point": pm_vars}

    # ---- rgb path ----------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=0)
    def rgb_patches(self, params, images):
        """images (B, H, W, 3) -> (rgb_patch (B,784,C), rgb_patch2 (B,3136,C))."""
        grid = self.vit.apply(params["vit"], images)            # (B,g,g,C)
        b, g, _, c = grid.shape
        rgb_patch = grid.reshape(b, g * g, c)
        rgb_patch2 = adaptive_avg_pool(grid, 56).reshape(b, 56 * 56, c)
        return (rgb_patch.astype(jnp.float32),
                rgb_patch2.astype(jnp.float32))

    # ---- xyz path ----------------------------------------------------------
    @functools.partial(jax.jit, static_argnames=("self", "with_2828"))
    def xyz_patches(self, params, organized_pc, with_2828: bool = False,
                    compact_pts=None):
        """organized_pc (B, H, W, 3) -> xyz_patch (B, 3136, 768) [+ extras].

        ``compact_pts`` (B, capacity, 3): optional host-precompacted valid
        points (ops.masked.host_compact_points via the loader) — exactly
        equivalent and ~5x cheaper for the sequential FPS/KNN kernels than
        the padded grid; device-side compaction is used otherwise when
        ``point_capacity`` is set.

        Returns a dict: xyz_patch, centers, ori_idx, center_idx, group_feats,
        and xyz_patch_2828 when requested.
        """
        b, h, w, _ = organized_pc.shape
        points = organized_pc.reshape(b, h * w, 3)
        mask = nonzero_point_mask(points)
        if compact_pts is not None:
            work_pts = compact_pts
            work_mask = nonzero_point_mask(work_pts)
        elif self.point_capacity and self.point_capacity < h * w:
            from cmdiad_tpu.ops.masked import compact_points
            work_pts = compact_points(points, mask, self.point_capacity)
            work_mask = nonzero_point_mask(work_pts)
        else:
            work_pts, work_mask = points, mask
        centers, ori_idx, center_idx = group_points(
            work_pts, work_mask, self.pm_config.num_group,
            self.pm_config.group_size, use_pallas=self.use_pallas)
        feats = self.point.apply(params["point"], work_pts, centers,
                                 ori_idx)                        # (B,G,768)
        # The (B, 224, 224, 768) splat grid is the biggest tensor in the
        # pipeline (1.2 GB f32 at B=8): the interp kernel emits it directly
        # in the compute dtype (bf16 halves its HBM traffic) and the
        # 3x3-valid + adaptive pooling chain over it runs as one fused
        # separable matmul pair (no 222² intermediate, no layout copy).
        # Interpolation distances/weights stay f32 inside the kernel.
        dt_name = jnp.dtype(self.dtype).name
        interp = three_nn_interpolate(points, mask, centers,
                                      feats.astype(jnp.float32),
                                      compute_dtype=dt_name,
                                      out_dtype=dt_name,
                                      use_pallas=self.use_pallas)
        grid = interp.reshape(b, h, w, -1)
        xyz_patch = avg3x3_then_adaptive_pool(grid, 56).reshape(b, 56 * 56, -1)
        out = {
            "xyz_patch": xyz_patch.astype(jnp.float32),
            "centers": centers, "ori_idx": ori_idx,
            "center_idx": center_idx,
            "group_feats": feats.astype(jnp.float32),
        }
        if with_2828:
            out["xyz_patch_2828"] = avg3x3_then_adaptive_pool(grid, 28).reshape(
                b, 28 * 28, -1).astype(jnp.float32)
        return out

    # ---- both -------------------------------------------------------------
    def extract(self, params, images=None, organized_pc=None,
                with_2828: bool = False, compact_pts=None):
        """Reference Features.__call__ equivalent (features.py:123-158)."""
        out = {}
        if images is not None:
            out["rgb_patch"], out["rgb_patch2"] = self.rgb_patches(params, images)
        if organized_pc is not None:
            out.update(self.xyz_patches(params, organized_pc, with_2828,
                                        compact_pts))
        return out
