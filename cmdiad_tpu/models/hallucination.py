"""MTFI hallucination (cross-modal distillation) networks in Flax.

Reimplements the four distillation nets of the reference
(``models/hallucination_network.py``) plus their training losses:

  FtoFMlp   HallucinationCrossModalityNetwork (:18-69) — per-direction
            LayerNorm + MlpModule stacks mapping 56²-grid patch features
            xyz<->rgb; losses cos / l2 / smooth_l1.
  FtoFConv  HallucinationCrossModalityConv (:72-143) — two 4-conv BN stacks
            on the 56² feature grid.
  FtoIMlp   HallucinationRGBFeatureToXYZInputMLP (:146-182) — LN + MLP
            768->1152->384->96->3, reshaped 56² and bicubic-upsampled to 224².
  FtoIConv  HallucinationFeatureToInputConv (:185-220) — conv 768->384,
            bicubic 56->224, then convs 384->96->32->3 with ReLUs.

The unusual MlpModule block structure (act after *every* linear including the
output, reference utils/utils.py:86-100) is reproduced exactly.

All modules are channels-last; inputs are (B, N=3136, C) token grids or
(B, H, W, C) images. BatchNorm uses flax batch_stats collections (mutable
during MTFI training, frozen running averages at inference).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from cmdiad_tpu.ops.pooling import bicubic_resize


def _grid(x, side=56):
    """(B, N, C) tokens -> (B, side, side, C) feature image."""
    b, n, c = x.shape
    return x.reshape(b, side, side, c)


def _tokens(x):
    """(B, H, W, C) -> (B, H*W, C)."""
    b, h, w, c = x.shape
    return x.reshape(b, h * w, c)


class MlpBlock(nn.Module):
    """fc1 -> act -> fc2 -> act -> fc3 -> act (utils/utils.py:86-100)."""
    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.gelu(nn.Dense(self.hidden, name="fc1", dtype=self.dtype)(x),
                    approximate=False)
        x = nn.gelu(nn.Dense(self.hidden, name="fc2", dtype=self.dtype)(x),
                    approximate=False)
        x = nn.gelu(nn.Dense(self.out, name="fc3", dtype=self.dtype)(x),
                    approximate=False)
        return x


class MlpModule(nn.Module):
    hidden: int
    out: int
    depth: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            x = MlpBlock(self.hidden, self.out, dtype=self.dtype,
                         name=f"block_{i}")(x)
        return x


def smooth_l1(pred, target):
    """torch nn.SmoothL1Loss(reduction='none'), beta=1."""
    d = jnp.abs(pred - target)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def _pairwise_loss(hallu, real, dist_method: str, axis: int = 2):
    """Reference loss reductions: sum over all but dim0, / batch."""
    if dist_method == "cos_dist":
        num = jnp.sum(hallu * real, axis=axis)
        den = jnp.maximum(jnp.linalg.norm(hallu, axis=axis)
                          * jnp.linalg.norm(real, axis=axis), 1e-30)
        per = 1.0 - num / den
    elif dist_method == "l2":
        per = jnp.linalg.norm(hallu - real, axis=axis)
    elif dist_method == "smooth_l1":
        per = smooth_l1(hallu, real)
    else:
        raise ValueError(dist_method)
    return jnp.sum(per) / per.shape[0]


class FtoFMlp(nn.Module):
    """Feature-to-Feature MLP net: xyz<->rgb patch-feature distillation."""

    xyz_dim: int = 768
    rgb_dim: int = 768
    hidden_ratio: float = 2.5
    mlp_depth: int = 1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.xyz_norm = nn.LayerNorm(name="xyz_norm", dtype=self.dtype)
        self.xyz_mlp = MlpModule(int(self.xyz_dim * self.hidden_ratio),
                                 self.rgb_dim, self.mlp_depth,
                                 dtype=self.dtype, name="xyz_mlp")
        self.rgb_norm = nn.LayerNorm(name="rgb_norm", dtype=self.dtype)
        self.rgb_mlp = MlpModule(int(self.rgb_dim * self.hidden_ratio),
                                 self.xyz_dim, self.mlp_depth,
                                 dtype=self.dtype, name="rgb_mlp")

    def hallucinate_xyz(self, rgb_feature):
        """(B, N, rgb_dim) -> hallucinated xyz features."""
        return self.xyz_from_rgb(rgb_feature)

    def xyz_from_rgb(self, rgb_feature):
        return self.rgb_mlp(self.rgb_norm(rgb_feature))

    def rgb_from_xyz(self, xyz_feature):
        return self.xyz_mlp(self.xyz_norm(xyz_feature))

    def __call__(self, xyz_feature, rgb_feature, dist_method: str = "cos_dist"):
        """Both-direction distillation losses (reference forward :47-69)."""
        xyz_h = self.xyz_from_rgb(rgb_feature)
        rgb_h = self.rgb_from_xyz(xyz_feature)
        loss_xyz = _pairwise_loss(xyz_h, xyz_feature, dist_method)
        loss_rgb = _pairwise_loss(rgb_h, rgb_feature, dist_method)
        return loss_xyz, loss_rgb

    def generate(self, feature, out_type: str):
        """out_type='xyz': rgb->xyz; 'rgb': xyz->rgb (reference :34-45)."""
        if out_type == "xyz":
            return self.xyz_from_rgb(feature)
        if out_type == "rgb":
            return self.rgb_from_xyz(feature)
        raise ValueError(out_type)


class _ConvStack(nn.Module):
    """conv3x3(s1,p1,no-bias)+BN+ReLU x3 then conv3x3 (reference :79-104)."""
    out_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(3):
            x = nn.Conv(768, (3, 3), padding=1, use_bias=False,
                        name=f"conv_{i}", dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bn_{i}", dtype=self.dtype)(x)
            x = nn.relu(x)
        return nn.Conv(self.out_dim, (3, 3), padding=1, use_bias=False,
                       name="conv_3", dtype=self.dtype)(x)


class FtoFConv(nn.Module):
    """Feature-to-Feature conv variant (HallucinationCrossModalityConv)."""

    xyz_dim: int = 768
    rgb_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.xyz_conv = _ConvStack(768, dtype=self.dtype, name="xyz_conv")
        self.rgb_conv = _ConvStack(768, dtype=self.dtype, name="rgb_conv")

    def generate(self, feature, out_type: str, train: bool = False):
        g = _grid(feature)
        if out_type == "xyz":
            return _tokens(self.rgb_conv(g, train))
        if out_type == "rgb":
            return _tokens(self.xyz_conv(g, train))
        raise ValueError(out_type)

    def __call__(self, xyz_feature, rgb_feature, sigmoid: bool = False,
                 train: bool = True):
        xyz_h = self.generate(rgb_feature, "xyz", train)
        rgb_h = self.generate(xyz_feature, "rgb", train)
        if sigmoid:
            sig = nn.sigmoid
            loss_xyz = _pairwise_loss(sig(xyz_h), sig(xyz_feature), "l2")
            loss_rgb = _pairwise_loss(sig(rgb_h), sig(rgb_feature), "l2")
        else:
            loss_xyz = _pairwise_loss(xyz_h, xyz_feature, "l2")
            loss_rgb = _pairwise_loss(rgb_h, rgb_feature, "l2")
        return loss_xyz, loss_rgb


class FtoIMlp(nn.Module):
    """Feature -> raw input MLP (HallucinationRGBFeatureToXYZInputMLP)."""

    in_dim: int = 768
    out_channels: int = 3   # 1 when estimate_depth
    out_size: int = 224
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feature):
        """(B, 3136, in_dim) -> (B, out_size, out_size, out_channels)."""
        x = nn.LayerNorm(name="norm", dtype=self.dtype)(feature)
        for i, h in enumerate((1152, 384, 96)):
            x = nn.Dense(h, name=f"mlp_{i}", dtype=self.dtype)(x)
            x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out_channels, name="mlp_3", dtype=self.dtype)(x)
        return bicubic_resize(_grid(x), self.out_size)

    def loss(self, feature, target):
        h = self(feature)
        # reference norms over the channel axis (dim=1 in NCHW, :180-181)
        per = jnp.linalg.norm(h - target, axis=-1)
        return jnp.sum(per) / per.shape[0]


class FtoIConv(nn.Module):
    """Feature -> raw input conv net (HallucinationFeatureToInputConv)."""

    in_dim: int = 768
    out_channels: int = 3
    out_size: int = 224
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feature):
        """(B, 3136, in_dim) -> (B, out_size, out_size, out_channels)."""
        x = _grid(feature)
        x = nn.Conv(384, (3, 3), padding=1, name="conv1", dtype=self.dtype)(x)
        x = bicubic_resize(x, self.out_size)
        x = nn.relu(nn.Conv(96, (3, 3), padding=1, name="conv2",
                            dtype=self.dtype)(x))
        x = nn.relu(nn.Conv(32, (3, 3), padding=1, name="conv3",
                            dtype=self.dtype)(x))
        return nn.Conv(self.out_channels, (3, 3), padding=1, name="conv4",
                       dtype=self.dtype)(x)

    def loss(self, feature, target):
        h = self(feature)
        per = jnp.linalg.norm(h - target, axis=-1)
        return jnp.sum(per) / per.shape[0]
