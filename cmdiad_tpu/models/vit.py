"""Vision Transformer (ViT-B/8, DINO weights) in Flax.

Reimplements the RGB backbone path of the reference
(``models/models.py:35-53``: timm ``vit_base_patch8_224_dino`` run as
patch_embed -> _pos_embed -> norm_pre -> 12 blocks -> norm, then the 784
patch tokens reshaped to a 28x28x768 grid).  The architecture is the standard
pre-LN ViT: conv patch embedding, learned cls token + position embeddings,
multi-head self-attention blocks with 4x GELU MLPs, LayerNorm eps 1e-6,
qkv_bias=True.  Weights convert from the timm checkpoint via
``models.convert.vit_from_timm``.

TPU notes: attention routes through the fused Pallas kernel
(ops/flash_attn.py) when ``use_flash`` — the (b, h, 785, 785) score tensors
were the blocks' dominant HBM traffic — with an einsum fallback elsewhere.
``dtype`` selects the compute precision (bfloat16 for speed, float32 for
checkpoint parity); parameters stay float32.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import flax.linen as nn


@dataclass(frozen=True)
class ViTConfig:
    img_size: int = 224
    patch_size: int = 8
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    ln_eps: float = 1e-6
    # DINOv2-style LayerScale (per-block learned residual scaling)
    layer_scale: bool = False
    # extra learned register/storage tokens prepended after cls (DINOv2 reg4)
    num_reg_tokens: int = 0

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid


VIT_CONFIGS = {
    # timm names accepted by the reference CLI (main.py:95-98)
    "vit_base_patch8_224_dino": ViTConfig(),
    "vit_base_patch8_224": ViTConfig(),
    "vit_base_patch8_224_in21k": ViTConfig(),
    "vit_small_patch8_224_dino": ViTConfig(embed_dim=384, num_heads=6),
    # DINOv2 ViT-B/14 at 518² -> 37x37 patch grid (models/models.py:36-39)
    "vit_base_patch14_dinov2.lvd142m": ViTConfig(
        img_size=518, patch_size=14, layer_scale=True),
    # tiny config for smoke tests / CLI e2e without real weights
    "tiny": ViTConfig(img_size=64, embed_dim=32, depth=2, num_heads=2),
}


class Attention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, name="qkv",
                       dtype=self.dtype)(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (b,n,h,d)
        # Fused (flash-style) softmax(qk^T)v on TPU — the (b, h, n, n)
        # score tensors never reach HBM (ops/flash_attn.py); einsum fallback
        # with f32 softmax elsewhere.
        from cmdiad_tpu.ops.flash_attn import fused_attention
        out = fused_attention(q, k, v, scale, use_flash=self.use_flash)
        out = out.reshape(b, n, c)
        return nn.Dense(self.dim, name="proj", dtype=self.dtype)(out)


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1", dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, name="fc2", dtype=self.dtype)(x)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    qkv_bias: bool
    ln_eps: float
    layer_scale: bool = False
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x):
        def scale(name, h):
            if not self.layer_scale:
                return h
            gamma = self.param(name, nn.initializers.constant(1e-5),
                               (self.dim,))
            return h * gamma.astype(self.dtype)

        y = nn.LayerNorm(epsilon=self.ln_eps, name="norm1", dtype=self.dtype)(x)
        x = x + scale("ls1", Attention(self.dim, self.num_heads, self.qkv_bias,
                                       dtype=self.dtype,
                                       use_flash=self.use_flash,
                                       name="attn")(y))
        y = nn.LayerNorm(epsilon=self.ln_eps, name="norm2", dtype=self.dtype)(x)
        x = x + scale("ls2", Mlp(int(self.dim * self.mlp_ratio), self.dim,
                                 dtype=self.dtype, name="mlp")(y))
        return x


class VisionTransformer(nn.Module):
    """Forward-features ViT returning the patch-token grid (B, g, g, C)."""

    config: ViTConfig = ViTConfig()
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, images):
        """images: (B, H, W, 3), already resized + ImageNet-normalised."""
        cfg = self.config
        b = images.shape[0]
        x = nn.Conv(cfg.embed_dim, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    name="patch_embed", dtype=self.dtype)(images.astype(self.dtype))
        x = x.reshape(b, cfg.num_patches, cfg.embed_dim)

        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, cfg.embed_dim))
        if cfg.num_reg_tokens:
            # timm register-token convention (``no_embed_class=True``, e.g.
            # vit_base_patch14_reg4_dinov2): pos_embed covers the PATCH
            # tokens only and is added before [cls, reg] are prepended
            # un-positioned — required for converted timm reg checkpoints.
            pos = self.param("pos_embed", nn.initializers.normal(0.02),
                             (1, cfg.num_patches, cfg.embed_dim))
            x = x + pos.astype(self.dtype)
            reg = self.param("reg_token", nn.initializers.zeros,
                             (1, cfg.num_reg_tokens, cfg.embed_dim))
            x = jnp.concatenate(
                [jnp.broadcast_to(cls, (b, 1, cfg.embed_dim)).astype(self.dtype),
                 jnp.broadcast_to(reg, (b,) + reg.shape[1:]).astype(self.dtype),
                 x], axis=1)
            n_prefix = 1 + cfg.num_reg_tokens
        else:
            pos = self.param("pos_embed", nn.initializers.normal(0.02),
                             (1, cfg.num_patches + 1, cfg.embed_dim))
            x = jnp.concatenate(
                [jnp.broadcast_to(cls, (b, 1, cfg.embed_dim)).astype(self.dtype),
                 x], axis=1)
            x = x + pos.astype(self.dtype)
            n_prefix = 1

        for i in range(cfg.depth):
            x = Block(cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio,
                      cfg.qkv_bias, cfg.ln_eps, layer_scale=cfg.layer_scale,
                      dtype=self.dtype, use_flash=self.use_flash,
                      name=f"blocks_{i}")(x)
        x = nn.LayerNorm(epsilon=cfg.ln_eps, name="norm", dtype=self.dtype)(x)
        patches = x[:, n_prefix:]  # drop cls/registers (models/models.py:39,52)
        return patches.reshape(b, cfg.grid, cfg.grid, cfg.embed_dim)
