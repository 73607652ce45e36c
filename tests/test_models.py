"""Backbone forward math + torch->flax converters vs numpy oracles.

Strategy (no pretrained weights are downloadable in this environment): build
random *torch-layout* state dicts with timm / Point-MAE naming, convert them
with models.convert, and check the flax forward pass against a from-scratch
numpy oracle of the documented architecture.  This validates both the
converter mapping and the model math in one shot — when the real checkpoints
are supplied, conversion is the only remaining variable.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cmdiad_tpu.models import vit as vit_mod
from cmdiad_tpu.models import point_mae as pm_mod
from cmdiad_tpu.models import convert


# ---------------------------------------------------------------------------
# numpy oracle pieces
# ---------------------------------------------------------------------------

def np_ln(x, w, b, eps):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def np_gelu(x):
    from scipy.special import erf
    return 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))


def np_linear(x, w, b=None):
    y = x @ w.T
    return y + b if b is not None else y


def np_block(x, sd, prefix, heads, eps, qkv_bias=True, pos=None):
    """One pre-LN transformer block, timm naming under `prefix`."""
    if pos is not None:
        x = x + pos
    h = np_ln(x, sd[f"{prefix}.norm1.weight"], sd[f"{prefix}.norm1.bias"], eps)
    b_, n, c = h.shape
    d = c // heads
    qkv = np_linear(h, sd[f"{prefix}.attn.qkv.weight"],
                    sd.get(f"{prefix}.attn.qkv.bias") if qkv_bias else None)
    qkv = qkv.reshape(b_, n, 3, heads, d).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q * d ** -0.5) @ k.transpose(0, 1, 3, 2)
    attn = np.exp(attn - attn.max(-1, keepdims=True))
    attn = attn / attn.sum(-1, keepdims=True)
    o = (attn @ v).transpose(0, 2, 1, 3).reshape(b_, n, c)
    x = x + np_linear(o, sd[f"{prefix}.attn.proj.weight"],
                      sd[f"{prefix}.attn.proj.bias"])
    h = np_ln(x, sd[f"{prefix}.norm2.weight"], sd[f"{prefix}.norm2.bias"], eps)
    h = np_gelu(np_linear(h, sd[f"{prefix}.mlp.fc1.weight"],
                          sd[f"{prefix}.mlp.fc1.bias"]))
    h = np_linear(h, sd[f"{prefix}.mlp.fc2.weight"],
                  sd[f"{prefix}.mlp.fc2.bias"])
    return x + h


def _rand_sd_vit(rng, cfg):
    """Random timm-style ViT state dict."""
    sd = {}
    c, hdim = cfg.embed_dim, int(cfg.embed_dim * cfg.mlp_ratio)
    sd["patch_embed.proj.weight"] = rng.normal(
        size=(c, 3, cfg.patch_size, cfg.patch_size)).astype(np.float32) * 0.05
    sd["patch_embed.proj.bias"] = rng.normal(size=(c,)).astype(np.float32) * 0.05
    sd["cls_token"] = rng.normal(size=(1, 1, c)).astype(np.float32) * 0.05
    # timm: reg-token models use no_embed_class (pos covers patch tokens
    # only); classic models embed [cls; patches]
    embed_len = cfg.num_patches if cfg.num_reg_tokens else cfg.num_patches + 1
    sd["pos_embed"] = rng.normal(size=(1, embed_len, c)).astype(np.float32) * 0.05
    for i in range(cfg.depth):
        t = f"blocks.{i}"
        for ln in ("norm1", "norm2"):
            sd[f"{t}.{ln}.weight"] = 1 + rng.normal(size=(c,)).astype(np.float32) * 0.05
            sd[f"{t}.{ln}.bias"] = rng.normal(size=(c,)).astype(np.float32) * 0.05
        sd[f"{t}.attn.qkv.weight"] = rng.normal(size=(3 * c, c)).astype(np.float32) * 0.05
        sd[f"{t}.attn.qkv.bias"] = rng.normal(size=(3 * c,)).astype(np.float32) * 0.05
        sd[f"{t}.attn.proj.weight"] = rng.normal(size=(c, c)).astype(np.float32) * 0.05
        sd[f"{t}.attn.proj.bias"] = rng.normal(size=(c,)).astype(np.float32) * 0.05
        sd[f"{t}.mlp.fc1.weight"] = rng.normal(size=(hdim, c)).astype(np.float32) * 0.05
        sd[f"{t}.mlp.fc1.bias"] = rng.normal(size=(hdim,)).astype(np.float32) * 0.05
        sd[f"{t}.mlp.fc2.weight"] = rng.normal(size=(c, hdim)).astype(np.float32) * 0.05
        sd[f"{t}.mlp.fc2.bias"] = rng.normal(size=(c,)).astype(np.float32) * 0.05
    sd["norm.weight"] = 1 + rng.normal(size=(c,)).astype(np.float32) * 0.05
    sd["norm.bias"] = rng.normal(size=(c,)).astype(np.float32) * 0.05
    return sd


def test_vit_forward_matches_numpy_oracle(rng):
    cfg = vit_mod.ViTConfig(img_size=32, patch_size=8, embed_dim=16,
                            depth=2, num_heads=2)
    sd = _rand_sd_vit(rng, cfg)
    variables = convert.vit_from_timm(sd, depth=cfg.depth)
    model = vit_mod.VisionTransformer(cfg)
    img = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    out = np.asarray(model.apply(variables, jnp.asarray(img)))

    # oracle: conv patch embed == unfold+matmul
    p = cfg.patch_size
    patches = img.reshape(2, 4, p, 4, p, 3).transpose(0, 1, 3, 2, 4, 5)
    patches = patches.reshape(2, 16, p * p * 3)
    w = sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0).reshape(p * p * 3, -1)
    x = patches @ w + sd["patch_embed.proj.bias"]
    cls = np.broadcast_to(sd["cls_token"], (2, 1, cfg.embed_dim))
    x = np.concatenate([cls, x], 1) + sd["pos_embed"]
    for i in range(cfg.depth):
        x = np_block(x, sd, f"blocks.{i}", cfg.num_heads, cfg.ln_eps)
    x = np_ln(x, sd["norm.weight"], sd["norm.bias"], cfg.ln_eps)
    oracle = x[:, 1:].reshape(2, 4, 4, cfg.embed_dim)
    np.testing.assert_allclose(out, oracle, rtol=1e-4, atol=1e-5)


def _rand_sd_pointmae(rng, cfg):
    sd = {}
    c = cfg.trans_dim

    def lin(name, o, i, bias=True):
        sd[f"{name}.weight"] = rng.normal(size=(o, i)).astype(np.float32) * 0.1
        if bias:
            sd[f"{name}.bias"] = rng.normal(size=(o,)).astype(np.float32) * 0.1

    def conv1d(name, o, i):
        sd[f"{name}.weight"] = rng.normal(size=(o, i, 1)).astype(np.float32) * 0.1
        sd[f"{name}.bias"] = rng.normal(size=(o,)).astype(np.float32) * 0.1

    def bn(name, ch):
        sd[f"{name}.weight"] = 1 + rng.normal(size=(ch,)).astype(np.float32) * 0.1
        sd[f"{name}.bias"] = rng.normal(size=(ch,)).astype(np.float32) * 0.1
        sd[f"{name}.running_mean"] = rng.normal(size=(ch,)).astype(np.float32) * 0.1
        sd[f"{name}.running_var"] = 1 + rng.uniform(size=(ch,)).astype(np.float32)

    conv1d("encoder.first_conv.0", 128, 3); bn("encoder.first_conv.1", 128)
    conv1d("encoder.first_conv.3", 256, 128)
    conv1d("encoder.second_conv.0", 512, 512); bn("encoder.second_conv.1", 512)
    conv1d("encoder.second_conv.3", cfg.encoder_dims, 512)
    lin("pos_embed.0", 128, 3); lin("pos_embed.2", c, 128)
    for i in range(cfg.depth):
        t = f"blocks.blocks.{i}"
        for ln in ("norm1", "norm2"):
            sd[f"{t}.{ln}.weight"] = 1 + rng.normal(size=(c,)).astype(np.float32) * 0.1
            sd[f"{t}.{ln}.bias"] = rng.normal(size=(c,)).astype(np.float32) * 0.1
        lin(f"{t}.attn.qkv", 3 * c, c, bias=False)
        lin(f"{t}.attn.proj", c, c)
        lin(f"{t}.mlp.fc1", 4 * c, c)
        lin(f"{t}.mlp.fc2", c, 4 * c)
    sd["norm.weight"] = 1 + rng.normal(size=(c,)).astype(np.float32) * 0.1
    sd["norm.bias"] = rng.normal(size=(c,)).astype(np.float32) * 0.1
    return sd


def test_point_mae_forward_matches_numpy_oracle(rng):
    cfg = pm_mod.PointMAEConfig(num_group=6, group_size=4, encoder_dims=8,
                                trans_dim=8, depth=4, num_heads=2,
                                fetch_idx=(1, 3))
    sd = _rand_sd_pointmae(rng, cfg)
    variables = convert.point_mae_from_torch(sd, depth=cfg.depth)
    model = pm_mod.PointTransformer(cfg)

    neigh = rng.normal(size=(2, cfg.num_group, cfg.group_size, 3)).astype(np.float32)
    centers = rng.normal(size=(2, cfg.num_group, 3)).astype(np.float32)
    # feed the (points, centers, idx) interface with points/idx chosen so the
    # gathered center-relative groups equal `neigh` exactly
    points = (neigh + centers[:, :, None, :]).reshape(2, -1, 3)
    idx = np.broadcast_to(
        np.arange(cfg.num_group * cfg.group_size, dtype=np.int32).reshape(
            1, cfg.num_group, cfg.group_size), (2,) + (cfg.num_group, cfg.group_size))
    out = np.asarray(model.apply(variables, jnp.asarray(points),
                                 jnp.asarray(centers), jnp.asarray(idx)))

    # ---- numpy oracle -----------------------------------------------------
    def bn_eval(x, name):
        return ((x - sd[f"{name}.running_mean"]) /
                np.sqrt(sd[f"{name}.running_var"] + 1e-5)
                * sd[f"{name}.weight"] + sd[f"{name}.bias"])

    def c1d(x, name):
        return x @ sd[f"{name}.weight"][:, :, 0].T + sd[f"{name}.bias"]

    bg = neigh.reshape(-1, cfg.group_size, 3)
    f = np.maximum(bn_eval(c1d(bg, "encoder.first_conv.0"),
                           "encoder.first_conv.1"), 0)
    f = c1d(f, "encoder.first_conv.3")
    gmax = f.max(1, keepdims=True)
    f = np.concatenate([np.broadcast_to(gmax, f.shape), f], -1)
    f = np.maximum(bn_eval(c1d(f, "encoder.second_conv.0"),
                           "encoder.second_conv.1"), 0)
    f = c1d(f, "encoder.second_conv.3").max(1)
    tokens = f.reshape(2, cfg.num_group, cfg.encoder_dims)

    pos = np_gelu(np_linear(centers, sd["pos_embed.0.weight"],
                            sd["pos_embed.0.bias"]))
    pos = np_linear(pos, sd["pos_embed.2.weight"], sd["pos_embed.2.bias"])

    x = tokens
    fetched = []
    for i in range(cfg.depth):
        x = np_block(x, sd, f"blocks.blocks.{i}", cfg.num_heads, cfg.ln_eps,
                     qkv_bias=False, pos=pos)
        if i in cfg.fetch_idx:
            fetched.append(x)
    fetched = [np_ln(f_, sd["norm.weight"], sd["norm.bias"], cfg.ln_eps)
               for f_ in fetched]
    oracle = np.concatenate(fetched, -1)
    np.testing.assert_allclose(out, oracle, rtol=1e-4, atol=1e-5)


def test_converted_param_shapes_match_init():
    """Converted pytree must be exactly init-shape-compatible (full size)."""
    import jax
    rng = np.random.default_rng(0)
    cfg = vit_mod.ViTConfig()
    sd = _rand_sd_vit(rng, cfg)
    converted = convert.vit_from_timm(sd)
    model = vit_mod.VisionTransformer(cfg)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    flat_c = jax.tree_util.tree_leaves_with_path(converted)
    flat_i = {jax.tree_util.keystr(p): v.shape
              for p, v in jax.tree_util.tree_leaves_with_path(init)}
    assert set(flat_i) == {jax.tree_util.keystr(p) for p, _ in flat_c}
    for p, v in flat_c:
        assert flat_i[jax.tree_util.keystr(p)] == v.shape, jax.tree_util.keystr(p)


def test_point_mae_converted_shapes_match_init():
    import jax
    rng = np.random.default_rng(0)
    cfg = pm_mod.PointMAEConfig()
    sd = _rand_sd_pointmae(rng, cfg)
    converted = convert.point_mae_from_torch(sd)
    model = pm_mod.PointTransformer(cfg)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, cfg.num_group * cfg.group_size, 3)),
                      jnp.zeros((1, cfg.num_group, 3)),
                      jnp.zeros((1, cfg.num_group, cfg.group_size), jnp.int32))
    flat_i = {jax.tree_util.keystr(p): v.shape
              for p, v in jax.tree_util.tree_leaves_with_path(init)}
    flat_c = {jax.tree_util.keystr(p): v.shape
              for p, v in jax.tree_util.tree_leaves_with_path(converted)}
    assert flat_i == flat_c


def test_point_bert_flavor_forward_matches_oracle(rng):
    """encoder_dims != trans_dim -> cls-token branch (models.py:326-351)."""
    cfg = pm_mod.PointMAEConfig(num_group=6, group_size=4, encoder_dims=5,
                                trans_dim=8, depth=4, num_heads=2,
                                fetch_idx=(1, 3))
    sd = _rand_sd_pointmae(rng, cfg)
    # encoder second conv emits encoder_dims=5; add pb-specific params
    sd["encoder.second_conv.3.weight"] = rng.normal(
        size=(5, 512, 1)).astype(np.float32) * 0.1
    sd["encoder.second_conv.3.bias"] = rng.normal(size=(5,)).astype(np.float32) * 0.1
    sd["cls_token"] = rng.normal(size=(1, 1, 8)).astype(np.float32) * 0.1
    sd["cls_pos"] = rng.normal(size=(1, 1, 8)).astype(np.float32) * 0.1
    sd["reduce_dim.weight"] = rng.normal(size=(8, 5)).astype(np.float32) * 0.1
    sd["reduce_dim.bias"] = rng.normal(size=(8,)).astype(np.float32) * 0.1

    variables = convert.point_mae_from_torch(sd, depth=cfg.depth)
    model = pm_mod.PointTransformer(cfg)
    neigh = rng.normal(size=(2, cfg.num_group, cfg.group_size, 3)).astype(np.float32)
    centers = rng.normal(size=(2, cfg.num_group, 3)).astype(np.float32)
    points = (neigh + centers[:, :, None, :]).reshape(2, -1, 3)
    idx = np.broadcast_to(
        np.arange(cfg.num_group * cfg.group_size, dtype=np.int32).reshape(
            1, cfg.num_group, cfg.group_size), (2, cfg.num_group, cfg.group_size))
    out = np.asarray(model.apply(variables, jnp.asarray(points),
                                 jnp.asarray(centers), jnp.asarray(idx)))

    # oracle: encoder -> reduce_dim -> cls prepend -> blocks(x+pos) -> fetch
    def bn_eval(x, name):
        return ((x - sd[f"{name}.running_mean"]) /
                np.sqrt(sd[f"{name}.running_var"] + 1e-5)
                * sd[f"{name}.weight"] + sd[f"{name}.bias"])

    def c1d(x, name):
        return x @ sd[f"{name}.weight"][:, :, 0].T + sd[f"{name}.bias"]

    bg = neigh.reshape(-1, cfg.group_size, 3)
    f = np.maximum(bn_eval(c1d(bg, "encoder.first_conv.0"),
                           "encoder.first_conv.1"), 0)
    f = c1d(f, "encoder.first_conv.3")
    gmax = f.max(1, keepdims=True)
    f = np.concatenate([np.broadcast_to(gmax, f.shape), f], -1)
    f = np.maximum(bn_eval(c1d(f, "encoder.second_conv.0"),
                           "encoder.second_conv.1"), 0)
    f = c1d(f, "encoder.second_conv.3").max(1)
    tokens = f.reshape(2, cfg.num_group, cfg.encoder_dims)
    tokens = np_linear(tokens, sd["reduce_dim.weight"], sd["reduce_dim.bias"])
    cls = np.broadcast_to(sd["cls_token"], (2, 1, cfg.trans_dim))
    x = np.concatenate([cls, tokens], 1)

    pos = np_gelu(np_linear(centers, sd["pos_embed.0.weight"],
                            sd["pos_embed.0.bias"]))
    pos = np_linear(pos, sd["pos_embed.2.weight"], sd["pos_embed.2.bias"])
    pos = np.concatenate(
        [np.broadcast_to(sd["cls_pos"], (2, 1, cfg.trans_dim)), pos], 1)

    fetched = []
    for i in range(cfg.depth):
        x = np_block(x, sd, f"blocks.blocks.{i}", cfg.num_heads, cfg.ln_eps,
                     qkv_bias=False, pos=pos)
        if i in cfg.fetch_idx:
            fetched.append(x)
    fetched = [np_ln(f_, sd["norm.weight"], sd["norm.bias"], cfg.ln_eps)[:, 1:]
               for f_ in fetched]
    oracle = np.concatenate(fetched, -1)
    np.testing.assert_allclose(out, oracle, rtol=1e-4, atol=1e-5)


def test_vit_layer_scale_and_registers(rng):
    """DINOv2-style LayerScale + register tokens: converter + forward."""
    import jax
    cfg = vit_mod.ViTConfig(img_size=28, patch_size=14, embed_dim=16,
                            depth=2, num_heads=2, layer_scale=True,
                            num_reg_tokens=2)
    sd = _rand_sd_vit(rng, cfg)
    for i in range(cfg.depth):
        sd[f"blocks.{i}.ls1.gamma"] = rng.normal(size=(16,)).astype(np.float32) * 0.1
        sd[f"blocks.{i}.ls2.gamma"] = rng.normal(size=(16,)).astype(np.float32) * 0.1
    sd["reg_token"] = rng.normal(size=(1, 2, 16)).astype(np.float32) * 0.05
    variables = convert.vit_from_timm(sd, depth=cfg.depth)
    model = vit_mod.VisionTransformer(cfg)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 3)))
    flat_i = {jax.tree_util.keystr(p): v.shape
              for p, v in jax.tree_util.tree_leaves_with_path(init)}
    flat_c = {jax.tree_util.keystr(p): np.asarray(v).shape
              for p, v in jax.tree_util.tree_leaves_with_path(variables)}
    assert flat_i == flat_c
    out = model.apply(variables, jnp.asarray(
        rng.normal(size=(1, 28, 28, 3)).astype(np.float32)))
    assert out.shape == (1, 2, 2, 16)
    assert np.isfinite(np.asarray(out)).all()
