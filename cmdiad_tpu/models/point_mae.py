"""Point-MAE point-cloud backbone in Flax with masked TPU grouping.

Reimplements the reference's ``PointTransformer`` (models/models.py:246-373,
Point_MAE flavour: encoder_dims == trans_dim == 384, so no cls token /
reduce_dim — the else-branch at :352):

  Group        FPS -> G=1024 centers, KNN -> M=128 neighbours, center-relative
               coordinates (models/models.py:81-113). Here: masked Pallas FPS
               + matmul KNN over the fixed-capacity padded point grid.
  Encoder      per-group mini-PointNet (models/models.py:183-215):
               Dense(3->128)+BN+ReLU+Dense(128->256), max-pool skip concat to
               512, Dense(512->512)+BN+ReLU+Dense(512->384), max-pool.
  Transformer  12 pre-LN blocks, dim 384, 6 heads, qkv_bias=False; the center
               positional MLP embedding is added to the tokens at *every*
               block input (models/models.py:240 ``x = block(x + pos)``).
               Features are collected after blocks {3, 11}, each passed
               through the shared final LayerNorm and concatenated to 768
               channels (models/models.py:237,348-350).

BatchNorms run with frozen running statistics — the backbone is always used
frozen in this pipeline (checkpoint stats convert from pointmae_pretrain.pth
via models.convert.point_mae_from_torch).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from cmdiad_tpu.ops.fps import farthest_point_sample
from cmdiad_tpu.ops.knn import masked_knn, gather_groups


@dataclass(frozen=True)
class PointMAEConfig:
    num_group: int = 1024
    group_size: int = 128
    encoder_dims: int = 384
    trans_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    ln_eps: float = 1e-5          # torch nn.LayerNorm default
    fetch_idx: Tuple[int, ...] = (3, 11)

    @property
    def out_dim(self) -> int:
        return self.trans_dim * len(self.fetch_idx)


def group_points(points, mask, num_group: int, group_size: int,
                 use_pallas: bool = True):
    """Masked FPS + KNN grouping indices (reference Group.forward :88-113).

    Unlike the reference we do NOT materialise the gathered (B, G, M, 3)
    neighbourhood here — the encoder gathers *after* its first linear layer
    (see GroupEncoder), which is algebraically identical, cheaper, and avoids
    an XLA:TPU fusion-emitter crash (fusion_util.cc CHECK in
    SpatialMajorConvolution when a dense directly consumes a big gather).

    Args:
      points: (B, P, 3) padded point sets; mask: (B, P).
    Returns:
      centers (B, G, 3), ori_idx (B, G, M), center_idx (B, G).
    """
    centers, center_idx = farthest_point_sample(points, mask, num_group,
                                                use_pallas=use_pallas)
    ori_idx = masked_knn(points, mask, centers, group_size)
    return centers, ori_idx, center_idx


def gather_neighborhoods(points, centers, idx):
    """Materialise reference-style center-relative groups (B, G, M, 3).

    Only needed by tests/oracles; the production path never forms this.
    """
    return gather_groups(points.astype(jnp.float32), idx) - centers[:, :, None, :]


class GroupEncoder(nn.Module):
    """Per-group mini-PointNet -> (B, G, encoder_dims).

    Computes Dense(3->128) on `(gather(points) - center)` as
    `gather(Dense(points)) - Dense(centers) + bias` — exact same linear map,
    but the gather moves 128-channel rows instead of feeding a dense (the
    XLA:TPU fusion workaround above), and all subsequent denses run on 2-D
    reshaped operands (3-D batched dots over gathered data also trigger the
    crash).
    """

    encoder_dims: int = 384
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, points, centers, idx):
        """points (B,P,3), centers (B,G,3), idx (B,G,M) -> (B,G,C)."""
        d0 = nn.Dense(128, name="first_conv_0", dtype=self.dtype)
        p_emb = d0(points.astype(self.dtype))              # pts@W + b
        c_emb = d0(centers.astype(self.dtype))             # cent@W + b
        bias = d0(jnp.zeros_like(centers, self.dtype))     # = b
        gathered = jax.vmap(lambda p, i: p[i])(p_emb, idx)  # (B,G,M,128)
        feat0 = gathered - c_emb[:, :, None, :] + bias[:, :, None, :]
        b, g, m, c = feat0.shape

        x = feat0.reshape(b * g * m, c)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         name="first_conv_1", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dense(256, name="first_conv_3", dtype=self.dtype)(x)
        x = x.reshape(b * g, m, 256)
        gmax = jnp.max(x, axis=1, keepdims=True)                 # (BG,1,256)
        x = jnp.concatenate([jnp.broadcast_to(gmax, x.shape), x], axis=-1)
        x = x.reshape(b * g * m, 512)
        x = nn.Dense(512, name="second_conv_0", dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         name="second_conv_1", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dense(self.encoder_dims, name="second_conv_3", dtype=self.dtype)(x)
        x = jnp.max(x.reshape(b * g, m, self.encoder_dims), axis=1)
        return x.reshape(b, g, self.encoder_dims)


class PointBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    qkv_bias: bool
    ln_eps: float
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5
        y = nn.LayerNorm(epsilon=self.ln_eps, name="norm1", dtype=self.dtype)(x)
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, name="attn_qkv",
                       dtype=self.dtype)(y)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        # fused softmax(qk^T)v on TPU (ops/flash_attn.py): the 1024-token
        # blocks' (b, h, n, n) score tensors never reach HBM
        from cmdiad_tpu.ops.flash_attn import fused_attention
        out = fused_attention(q, k, v, scale,
                              use_flash=self.use_flash).reshape(b, n, c)
        x = x + nn.Dense(self.dim, name="attn_proj", dtype=self.dtype)(out)
        y = nn.LayerNorm(epsilon=self.ln_eps, name="norm2", dtype=self.dtype)(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1",
                     dtype=self.dtype)(y)
        h = nn.gelu(h, approximate=False)
        x = x + nn.Dense(self.dim, name="mlp_fc2", dtype=self.dtype)(h)
        return x


class PointTransformer(nn.Module):
    """Encoder + 12-block transformer over grouped point tokens.

    FPS/KNN index selection happens *outside* the module (see
    ``group_points``) so the backbone stays a pure params->features function;
    the neighbourhood gather itself lives inside GroupEncoder (fused with its
    first linear layer).  Returns (B, G, 768) multi-layer features
    (fetch {3,11} concat).
    """

    config: PointMAEConfig = PointMAEConfig()
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, points, centers, idx):
        cfg = self.config
        tokens = GroupEncoder(cfg.encoder_dims, dtype=self.dtype,
                              name="encoder")(points, centers, idx)  # (B,G,E)

        pos = nn.Dense(128, name="pos_embed_0", dtype=self.dtype)(
            centers.astype(self.dtype))
        pos = nn.gelu(pos, approximate=False)
        pos = nn.Dense(cfg.trans_dim, name="pos_embed_2", dtype=self.dtype)(pos)

        # Point-BERT flavour (encoder_dims != trans_dim): project tokens and
        # prepend a learned cls token/pos (reference models/models.py:261-264,
        # 326-351); Point_MAE takes the plain else-branch (:352-373).
        with_cls = cfg.encoder_dims != cfg.trans_dim
        x = tokens
        if with_cls:
            x = nn.Dense(cfg.trans_dim, name="reduce_dim", dtype=self.dtype)(x)
            b = x.shape[0]
            cls_tok = self.param("cls_token", nn.initializers.zeros,
                                 (1, 1, cfg.trans_dim))
            cls_pos = self.param("cls_pos", nn.initializers.normal(1.0),
                                 (1, 1, cfg.trans_dim))
            x = jnp.concatenate(
                [jnp.broadcast_to(cls_tok, (b, 1, cfg.trans_dim)).astype(self.dtype), x], axis=1)
            pos = jnp.concatenate(
                [jnp.broadcast_to(cls_pos, (b, 1, cfg.trans_dim)).astype(self.dtype), pos], axis=1)

        fetched = []
        for i in range(cfg.depth):
            x = PointBlock(cfg.trans_dim, cfg.num_heads, cfg.mlp_ratio,
                           cfg.qkv_bias, cfg.ln_eps, dtype=self.dtype,
                           use_flash=self.use_flash,
                           name=f"blocks_{i}")(x + pos)
            if i in cfg.fetch_idx:
                fetched.append(x)
        norm = nn.LayerNorm(epsilon=cfg.ln_eps, name="norm", dtype=self.dtype)
        if with_cls:
            fetched = [norm(f)[:, 1:] for f in fetched]   # drop cls (:348)
        else:
            fetched = [norm(f) for f in fetched]
        return jnp.concatenate(fetched, axis=-1)                 # (B,G,768)
