"""Typed configuration for detection runs.

Replaces the reference's two argparse surfaces (~50 flags in
``/root/reference/main.py:85-188`` and ~30 in
``hallucination_network_pretrain.py:21-85``) with one frozen dataclass plus
named method presets.  Dead reference flags (``--asy_memory_bank``,
``--similarity_only``, ``--need_detection_head``, ... — parsed but never read,
see SURVEY.md Q5) are intentionally dropped.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


METHOD_NAMES = (
    "DINO",                # RGB-only memory bank
    "Point_MAE",           # point-cloud-only memory bank
    "DINO+Point_MAE",      # dual bank, also the feature dumper for MTFI
    "Depth",               # depth-map bank (reference defines it; runner exposes it here)
    "WithHallucination",           # MTFI FtoF (MLP/conv) or ItoF (HRNet)
    "WithHallucinationFromFeature",  # MTFI FtoI: hallucinate the *input*, re-encode
)


@dataclass(frozen=True)
class Config:
    """Detection/eval configuration (reference ``main.py`` parser equivalent)."""

    # --- method selection -------------------------------------------------
    method_name: str = "DINO+Point_MAE"
    # 'rgb' or 'xyz': which modality is present at inference (MTFI variants).
    main_modality: str = ""
    # fusion-module flavour for the MTFI methods (reference flags use_hn /
    # use_hn_conv / use_hn_from_rgb_mlp / use_hn_from_rgb_conv / use_hrnet,
    # main.py:161-167). Exactly one may be set for hallucination methods.
    use_hn: bool = False
    use_hn_conv: bool = False
    use_hn_from_rgb_mlp: bool = False
    use_hn_from_rgb_conv: bool = False
    use_hrnet: bool = False
    c_hrnet: int = 512  # reference default 48 is broken (SURVEY Q4); 512 works
    fusion_module_path: str = ""
    use_depth: bool = False

    # --- backbones ---------------------------------------------------------
    rgb_backbone_name: str = "vit_base_patch8_224_dino"
    xyz_backbone_name: str = "Point_MAE"
    group_size: int = 128   # KNN group size M (models/models.py:12)
    num_group: int = 1024   # FPS centers G
    rgb_ckpt_path: str = ""   # converted DINO weights (.npz / orbax)
    xyz_ckpt_path: str = ""   # converted Point-MAE weights

    # --- dataset -----------------------------------------------------------
    dataset_type: str = "mvtec3d"  # or 'eyecandies'
    dataset_path: str = "datasets/mvtec_3d"
    class_name: Optional[str] = None  # None = all classes
    rgb_size: int = 224
    xyz_size: int = 224
    gt_size: int = 224
    max_sample: int = 500
    train_with_validation: bool = False
    # multi-class runs: decode class N+1's samples on a background thread
    # while class N computes (runner.run_detection); costs host RAM — peak
    # residency is TWO classes (class N's decoded samples plus class N+1
    # filling), ~1 MB/sample at 224²
    preload_next_class: bool = True

    # --- memory bank / scoring ---------------------------------------------
    # keep pass-1 train features in host RAM so the OCSVM-calibration pass
    # skips dataset IO + backbone re-extraction (exact same scores; costs
    # ~12 MB/sample for the dual method). The reference re-extracts
    # (cmdiad_runner.py:57-65).
    cache_train_features: bool = False
    f_coreset: float = 0.1
    coreset_eps: float = 0.9
    coreset_dtype: str = "FP16"  # 'FP16' | 'TF32' | 'FP32' (compute dtype of greedy loop)
    # 'l2' | 'l1' | 'cos_dist' (the reference's three options,
    # features.py:186-205) | 'l2_int8': l2 with the streaming bank-min
    # kernel's -2·q·bᵀ cross term quantised to int8 per row (s8 MXU peak is
    # 2x bf16 on v5e; the |q|²/|b|² terms and every dense/jnp path stay
    # exact f32).  Since round 5 the kernel (bf16 AND int8) only SELECTS
    # the argmin with the quantised product; the min value itself is
    # recomputed exactly in f32 for the selected row
    # (ops/pallas_scoring._exact_refine), so the only residual error is a
    # near-tie argmin flip reporting the true distance of the near-tie.
    dist_method_s: str = "l2"
    dist_method_coreset: str = "l2"
    random_state: Optional[int] = None  # SRP seed; None -> 0 (reference is nondeterministic here)
    n_reweight: int = 3
    # Bit-exact replication of the reference's uint8-quantised score-map blur
    # (ToPILImage mode-'L' -> Pillow integer box blur, utils/utils.py:71-83).
    # Default off: the float blur is strictly more precise; turn on when
    # comparing metrics against reference runs / converted checkpoints.
    quantized_blur: bool = False

    # --- score fusion lambdas (main.py:114-133) ----------------------------
    xyz_s_lambda: float = 1.0
    xyz_smap_lambda: float = 1.0
    rgb_s_lambda: float = 0.1
    rgb_smap_lambda: float = 0.1
    fusion_s_lambda: float = 1.0
    fusion_smap_lambda: float = 1.0

    # --- OCSVM late fusion ---------------------------------------------------
    ocsvm_nu: float = 0.5
    ocsvm_maxiter: int = 1000
    ocsvm_backend: str = "sklearn"  # 'sklearn' (bit-parity) | 'jax'
    # cap on the pixel rows the SEG fuser is fit on (deterministic stride
    # over the n_train·gt² λ-weighted map rows, selected on device so only
    # the kept rows cross D2H).  The full set at production scale is ~10M
    # rows and sklearn's SGD fit on it measures ~65 s of host time per
    # class — for a 2-feature linear direction that a 1–2M-row stride
    # reproduces to ~1e-3 (and AUROC is scale-invariant in x·coef).
    # None = fit on every row (exact reference behaviour).
    ocsvm_seg_max_rows: Optional[int] = 2_000_000

    # --- feature dumping for MTFI distillation training ----------------------
    save_feature_for_fusion: bool = False
    save_frgb_xyz: bool = False
    save_rgb_fxyz: bool = False
    save_path: str = ""
    save_path_frgb_xyz: str = ""
    save_path_rgb_fxyz: str = ""

    # --- outputs --------------------------------------------------------------
    save_results: bool = True
    results_dir: str = "results"
    # persist fitted per-class state (banks + NN tables + Q1 stats + linear
    # OCSVM fusers) under <dir>/<class>.npz and serve from it on the next
    # run, skipping the whole fit — a serving capability the reference
    # lacks (banks rebuilt per run per class, SURVEY.md §5). "" = off.
    bank_cache_dir: str = ""
    save_raw_results: bool = False
    save_seg_results: bool = False
    experiment_note: str = ""

    # --- TPU execution -----------------------------------------------------
    # compute dtype for backbone matmuls: 'float32' for parity, 'bfloat16' for speed
    compute_dtype: str = "float32"
    batch_size: int = 1          # feature-extraction batch (reference is locked to 1)
    data_axis: str = "data"      # mesh axis names
    model_axis: str = "model"
    mesh_shape: Tuple[int, ...] = ()  # () = single device
    shard_bank: bool = False     # shard memory-bank rows over the data axis
    use_pallas: bool = True      # Pallas kernels for FPS/coreset (False = pure jnp)
    # run the whole per-batch eval (extraction -> scoring -> λ-stack ->
    # OCSVM fusion) as ONE jitted program on the single-device path: same
    # math, ~5 fewer dispatch RPCs per batch (each ~60 ms behind the remote
    # relay).  Off restores the staged per-stage programs (useful when
    # attributing time per stage).
    fused_eval: bool = True
    # fused attention kernel in the backbones (ops/flash_attn.py); separate
    # knob because its Mosaic compile is a large one-time cost per shape
    use_flash: bool = False
    seed: int = 0

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def validate(self) -> "Config":
        if self.method_name not in METHOD_NAMES:
            raise ValueError(f"unknown method {self.method_name!r}; choose from {METHOD_NAMES}")
        n_fusion_flags = sum(
            [self.use_hn, self.use_hn_conv, self.use_hn_from_rgb_mlp,
             self.use_hn_from_rgb_conv, self.use_hrnet])
        if self.method_name in ("WithHallucination", "WithHallucinationFromFeature"):
            if self.main_modality not in ("rgb", "xyz"):
                raise ValueError("hallucination methods need main_modality in {'rgb','xyz'}")
            if n_fusion_flags != 1:
                raise ValueError("exactly one fusion-module flag must be set for MTFI methods")
            # flavour/method compatibility is statically known — reject now
            # instead of crashing after the first backbone forward
            if self.method_name == "WithHallucination" and not (
                    self.use_hn or self.use_hn_conv or self.use_hrnet):
                raise ValueError(
                    "WithHallucination needs use_hn / use_hn_conv / use_hrnet "
                    "(feature- or input-to-feature nets); the FtoI flags "
                    "belong to WithHallucinationFromFeature")
            if self.method_name == "WithHallucinationFromFeature" and not (
                    self.use_hn_from_rgb_mlp or self.use_hn_from_rgb_conv):
                raise ValueError(
                    "WithHallucinationFromFeature needs use_hn_from_rgb_mlp "
                    "or use_hn_from_rgb_conv (feature-to-input nets)")
        if self.dist_method_s not in ("l2", "l1", "cos_dist", "l2_int8"):
            raise ValueError(f"bad dist_method_s {self.dist_method_s!r}")
        if len(self.mesh_shape) > 1:
            # detection meshes are data-parallel only: every consumer builds
            # Mesh(devices.reshape(shape), ('data',)) — a 2-D shape would
            # crash mid-fit with an opaque reshape error (TP/PP axes exist
            # in the training TrainConfig and the dryrun, not here)
            raise ValueError(
                f"detection mesh_shape must be 1-D (data-parallel), e.g. "
                f"(8,) — got {self.mesh_shape!r}")
        return self


# Named presets matching the reference README run commands (README.md:60-214).
_PRESETS = {
    "rgb": dict(method_name="DINO"),
    "xyz": dict(method_name="Point_MAE"),
    "dual": dict(method_name="DINO+Point_MAE"),
    "mtfi_ftof_xyz_main": dict(method_name="WithHallucination", main_modality="xyz", use_hn=True),
    "mtfi_ftof_rgb_main": dict(method_name="WithHallucination", main_modality="rgb", use_hn=True),
    "mtfi_itof_xyz_main": dict(method_name="WithHallucination", main_modality="xyz", use_hrnet=True),
    "mtfi_itof_rgb_main": dict(method_name="WithHallucination", main_modality="rgb", use_hrnet=True),
    "mtfi_ftoi_xyz_main": dict(
        method_name="WithHallucinationFromFeature", main_modality="xyz", use_hn_from_rgb_conv=True),
    "mtfi_ftoi_rgb_main": dict(
        method_name="WithHallucinationFromFeature", main_modality="rgb", use_hn_from_rgb_conv=True),
}


def method_preset(name: str, **overrides) -> Config:
    if name not in _PRESETS:
        raise KeyError(f"unknown preset {name!r}; choose from {sorted(_PRESETS)}")
    return Config(**{**_PRESETS[name], **overrides}).validate()


@dataclass(frozen=True)
class TrainConfig:
    """MTFI distillation training config (reference pretrain parser equivalent)."""

    train_method: str = "HallucinationCrossModality"
    data_path: str = ""
    output_dir: str = "./output_dir"
    batch_size: int = 64
    epochs: int = 100
    accum_iter: int = 1
    # reference parses 1.5e-6 but never passes it to Adam (pretrain:261);
    # 0.0 matches actual behaviour, set >0 to opt in
    weight_decay: float = 0.0
    lr: Optional[float] = None
    blr: float = 0.002          # absolute_lr = blr * eff_batch / 256 (pretrain:233-234)
    min_lr: float = 0.0
    warmup_epochs: int = 10
    seed: int = 3407
    resume: str = ""
    start_epoch: int = 0
    dist_method: str = "l2"
    sigmoid_loss: bool = False
    mlp_depth: int = 1
    c_hrnet: int = 512
    rgb_backbone: str = "dino"
    estimate_depth: bool = False
    save_every: int = 5
    # TPU execution
    mesh_shape: Tuple[int, ...] = ()
    data_axis: str = "data"
    model_axis: str = "model"
    compute_dtype: str = "float32"

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)


TRAIN_METHODS = (
    "HallucinationCrossModality",
    "HallucinationCrossModalityConv",
    "RGBFeatureToXYZInputMLP",
    "XYZFeatureToRGBInputMLP",
    "RGBFeatureToXYZInputConv",
    "XYZFeatureToRGBInputConv",
    "RGBInputToXYZFeatureHRNET",
    "XYZInputToRGBFeatureHRNET",
)
