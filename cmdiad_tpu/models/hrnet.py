"""Truncated HRNet (Input-to-Feature hallucination net) in Flax.

Reimplements the reference's ``models/hrnet.HRNet`` *as actually executed*
(hrnet.py:146-295): a stride-4 stem (two 3x3 stride-2 convs with BN+ReLU)
followed by three stages of four ResNet Bottlenecks at 56² resolution and a
final 1x1 conv to 768 channels.  The multi-branch HRNet stages 2-4 are
commented out in the reference (:189-244) and are not reproduced.

Note reference quirk Q4 (SURVEY.md): the final conv consumes 512 channels, so
the constructor's ``c`` argument must be 512 for the network to run at all
(the README commands pass 128/192, which crash upstream).  Here the input
width of the final layer is fixed to the true 512 and ``c`` only controls the
declared output contract, defaulting correct.

Maps a (B, 224, 224, 3) image (RGB or organized-XYZ) to a (B, 56, 56, 768)
feature grid; the training loss is the summed per-token L2 distance to the
target 3136x768 patch features (hrnet.py:286-295).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn


class Bottleneck(nn.Module):
    """ResNet bottleneck, expansion 4 (reference hrnet.py:8-43)."""

    planes: int
    with_downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, name=name, dtype=self.dtype)
        residual = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1",
                      dtype=self.dtype)(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      name="conv2", dtype=self.dtype)(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, name="conv3",
                      dtype=self.dtype)(out)
        out = bn("bn3")(out)
        if self.with_downsample:
            residual = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                               name="down_conv", dtype=self.dtype)(x)
            residual = bn("down_bn")(residual)
        return nn.relu(out + residual)


class HRNet(nn.Module):
    """Stem + 3x4 bottlenecks + 1x1 head -> (B, 56, 56, out_dim)."""

    out_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, name=name, dtype=self.dtype)
        x = nn.Conv(64, (3, 3), strides=2, padding=1, use_bias=False,
                    name="conv1", dtype=self.dtype)(image.astype(self.dtype))
        x = nn.relu(bn("bn1")(x))
        x = nn.Conv(128, (3, 3), strides=2, padding=1, use_bias=False,
                    name="conv2", dtype=self.dtype)(x)
        x = nn.relu(bn("bn2")(x))                       # (B, 56, 56, 128)

        for layer in range(1, 4):
            for i in range(4):
                x = Bottleneck(128, with_downsample=(layer == 1 and i == 0),
                               dtype=self.dtype,
                               name=f"layer{layer}_{i}")(x, train)
        return nn.Conv(self.out_dim, (1, 1), name="final_layer",
                       dtype=self.dtype)(x)

    def loss(self, image, feature_tokens, train: bool = True):
        """L2 feature-matching loss (reference hrnet.py:286-295).

        feature_tokens: (B, 3136, out_dim).
        """
        h = self(image, train)
        b = h.shape[0]
        h_tok = h.reshape(b, -1, h.shape[-1])
        per = jnp.linalg.norm(h_tok - feature_tokens, axis=2)
        return jnp.sum(per) / b
