"""Method factory (reference cmdiad_runner.py:16-31 method registry +
Features.__init__ fusion-module selection, features.py:91-112)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cmdiad_tpu.config import Config
from cmdiad_tpu.models.backbone import DualBackbone
from cmdiad_tpu.models import convert
from cmdiad_tpu.models.hallucination import FtoFMlp, FtoFConv, FtoIMlp, FtoIConv
from cmdiad_tpu.models.hrnet import HRNet
from cmdiad_tpu.methods import variants

_METHODS = {
    "DINO": variants.RGBMethod,
    "Point_MAE": variants.PointMethod,
    "DINO+Point_MAE": variants.DoubleMethod,
    "Depth": variants.DepthMethod,
    "WithHallucination": variants.HallucinationMethod,
    "WithHallucinationFromFeature": variants.HallucinationFromFeatureMethod,
}


def build_fusion(cfg: Config, backbone: Optional[DualBackbone] = None):
    """(module, variables) for the configured MTFI fusion net, or (None, None).

    Feature dims derive from the backbone configs (reference hardcodes 768,
    features.py:91-106); this keeps MTFI usable with the small/tiny smoke
    backbones too.
    """
    dtype = jnp.dtype(cfg.compute_dtype)
    xyz_dim = backbone.pm_config.out_dim if backbone else 768
    rgb_dim = backbone.vit_config.embed_dim if backbone else 768
    if cfg.use_hn:
        net = FtoFMlp(xyz_dim, rgb_dim, dtype=dtype)
        init_args = (jnp.zeros((1, 4, xyz_dim)), jnp.zeros((1, 4, rgb_dim)))
        loader = convert.ftof_mlp_from_torch
    elif cfg.use_hn_conv:
        net = FtoFConv(xyz_dim, rgb_dim, dtype=dtype)
        init_args = (jnp.zeros((1, 3136, xyz_dim)),
                     jnp.zeros((1, 3136, rgb_dim)))
        loader = convert.ftof_conv_from_torch
    elif cfg.use_hn_from_rgb_mlp:
        in_dim = rgb_dim if cfg.main_modality == "rgb" else xyz_dim
        net = FtoIMlp(in_dim, out_size=cfg.xyz_size, dtype=dtype)
        init_args = (jnp.zeros((1, 3136, in_dim)),)
        loader = convert.ftoi_mlp_from_torch
    elif cfg.use_hn_from_rgb_conv:
        in_dim = rgb_dim if cfg.main_modality == "rgb" else xyz_dim
        net = FtoIConv(in_dim, out_size=cfg.xyz_size, dtype=dtype)
        init_args = (jnp.zeros((1, 3136, in_dim)),)
        loader = convert.ftoi_conv_from_torch
    elif cfg.use_hrnet:
        out_dim = xyz_dim if cfg.main_modality == "rgb" else rgb_dim
        net = HRNet(out_dim, dtype=dtype)
        init_args = (jnp.zeros((1, cfg.rgb_size, cfg.rgb_size, 3)),)
        loader = convert.hrnet_from_torch
    else:
        return None, None

    if cfg.fusion_module_path:
        path = cfg.fusion_module_path
        if path.endswith((".pth", ".pt")):
            fusion_vars = loader(convert.load_torch_checkpoint(path))
            fusion_vars = jax.tree.map(jnp.asarray, fusion_vars)
        else:
            from cmdiad_tpu.train.checkpoint import load_pytree
            fusion_vars = load_pytree(path)
    else:
        fusion_vars = net.init(jax.random.PRNGKey(0), *init_args)
    return net, fusion_vars


def load_backbone_params(cfg: Config, backbone: DualBackbone):
    """Converted checkpoints when paths are configured; random otherwise."""
    params = backbone.init_params(cfg.seed)
    if cfg.rgb_ckpt_path:
        sd = convert.load_torch_checkpoint(cfg.rgb_ckpt_path)
        params["vit"] = jax.tree.map(
            jnp.asarray, convert.vit_from_timm(sd, depth=backbone.vit_config.depth))
    if cfg.xyz_ckpt_path:
        sd = convert.load_torch_checkpoint(cfg.xyz_ckpt_path)
        if cfg.xyz_backbone_name == "Point_Bert":
            sd = convert.strip_pointbert_prefixes(sd)
        else:
            sd = convert.strip_pointmae_prefixes(sd)
        params["point"] = jax.tree.map(
            jnp.asarray,
            convert.point_mae_from_torch(sd, depth=backbone.pm_config.depth))
    return params


def build_backbone(cfg: Config) -> DualBackbone:
    """Construct the DualBackbone for a config (no params).

    Build this ONCE per process and share it across classes/runners: the
    jitted extraction programs are trace-cached keyed on the backbone
    instance, so a fresh backbone per class would re-trace everything
    (reference main.py:22-32 pays the analogous per-class model rebuild).
    """
    pm_config = None
    if cfg.xyz_backbone_name == "tiny":
        from cmdiad_tpu.models.point_mae import PointMAEConfig
        pm_config = PointMAEConfig(
            num_group=cfg.num_group, group_size=cfg.group_size,
            encoder_dims=16, trans_dim=16, depth=2, num_heads=2,
            fetch_idx=(0, 1))
    elif cfg.xyz_backbone_name == "Point_Bert":
        # reference models/models.py:31-33: encoder_dims=256 flavour
        from cmdiad_tpu.models.point_mae import PointMAEConfig
        pm_config = PointMAEConfig(
            num_group=cfg.num_group, group_size=cfg.group_size,
            encoder_dims=256)
    return DualBackbone(
        rgb_backbone_name=cfg.rgb_backbone_name,
        num_group=cfg.num_group, group_size=cfg.group_size,
        compute_dtype=cfg.compute_dtype, use_pallas=cfg.use_pallas,
        use_flash=cfg.use_flash, image_size=cfg.rgb_size,
        pm_config=pm_config)


def build_method(cfg: Config, backbone: Optional[DualBackbone] = None,
                 params=None, fusion=None, fusion_vars=None):
    cfg = cfg.validate()
    if backbone is None:
        backbone = build_backbone(cfg)
    if params is None:
        params = load_backbone_params(cfg, backbone)
    if fusion is None:
        fusion, fusion_vars = build_fusion(cfg, backbone)
    cls = _METHODS[cfg.method_name]
    return cls(cfg, backbone, params, fusion=fusion, fusion_vars=fusion_vars)
