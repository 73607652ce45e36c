"""Coverage for eyecandies conversion, tiff codecs, Q1 flag, bf16, CLI e2e."""

import json
import numpy as np
import pytest

from cmdiad_tpu.data import tiffio


def test_tiff_lzw_packbits_decode(rng, tmp_path):
    """Decode LZW / PackBits / deflate strips (written via PIL for interop)."""
    from PIL import Image
    arr = rng.integers(0, 255, (31, 43, 3)).astype(np.uint8)
    for comp in ("tiff_lzw", "packbits", "tiff_adobe_deflate"):
        p = str(tmp_path / f"{comp}.tiff")
        Image.fromarray(arr).save(p, compression=comp)
        out = tiffio.imread(p)
        np.testing.assert_array_equal(out, arr, err_msg=comp)


def _build_synthetic_eyecandies(rng, src, size=512, n_train=2, n_test=2):
    """Raw Eyecandies-layout tree (depth png + yaml + pose + rgb + mask);
    test sample 1 carries a defect mask, the rest are good."""
    import yaml
    from PIL import Image

    for split, n in (("train", n_train), ("test_public", n_test)):
        d = src / "CandyCane" / split / "data"
        d.mkdir(parents=True)
        for i in range(n):
            stem = str(i).zfill(3) if split == "train" else str(i).zfill(2)
            depth = (rng.uniform(0.3, 0.9, (size, size)) * 65535).astype(np.uint16)
            Image.fromarray(depth, mode="I;16").save(d / f"{stem}_depth.png")
            with open(d / f"{stem}_info_depth.yaml", "w") as f:
                yaml.safe_dump({"normalization": {"min": 0.5, "max": 1.5}}, f)
            np.savetxt(d / f"{stem}_pose.txt", np.eye(4))
            Image.fromarray(rng.integers(0, 255, (size, size, 3)).astype(
                np.uint8)).save(d / f"{stem}_image_4.png")
            mask = np.zeros((size, size, 3), np.uint8)
            if split == "test_public" and i == 1:
                mask[size // 5: size // 3, size // 5: size // 3] = 255
            Image.fromarray(mask).save(d / f"{stem}_mask.png")
            # pad the dir to the reference's 17-files-per-sample layout
            for j in range(12):
                (d / f"{stem}_pad{j}.txt").write_text("x")


def test_eyecandies_conversion(rng, tmp_path):
    """Synthetic Eyecandies layout -> MVTec layout round trip."""
    from cmdiad_tpu.preprocess.eyecandies import convert_dataset

    size = 512
    _build_synthetic_eyecandies(rng, tmp_path / "eye", size=size)
    src = tmp_path / "eye"
    dst = tmp_path / "out"
    convert_dataset(str(src), str(dst))
    tiffs = sorted((dst / "CandyCane").rglob("*.tiff"))
    assert len(tiffs) == 4  # 2 train + 2 test
    pc = tiffio.imread(str(tiffs[0]))
    assert pc.shape == (size, size, 3) and pc.dtype == np.float32
    assert (dst / "CandyCane" / "test" / "bad" / "gt").exists()


def test_eyecandies_converted_tree_detect_e2e(rng, tmp_path, capsys,
                                              monkeypatch):
    """The converter's output must run through the FULL detection CLI
    (dataset_type=eyecandies): conversion -> loader -> banks -> coreset ->
    OCSVM -> metrics, closing the Eyecandies loop end to end."""
    from cmdiad_tpu.preprocess.eyecandies import convert_dataset
    from cmdiad_tpu import cli

    # the converter (like the reference, preprocessing_eyecandies.py) is
    # hardwired to the real dataset's 512x512 depth maps
    _build_synthetic_eyecandies(rng, tmp_path / "eye", size=512,
                                n_train=3, n_test=3)
    dst = tmp_path / "conv"
    convert_dataset(str(tmp_path / "eye"), str(dst))
    monkeypatch.chdir(tmp_path)
    cli.main(["detect", "--method_name", "DINO",
              "--rgb_backbone_name", "tiny", "--xyz_backbone_name", "tiny",
              "--dataset_type", "eyecandies",
              "--dataset_path", str(dst), "--class_name", "CandyCane",
              "--rgb_size", "64", "--xyz_size", "64", "--gt_size", "64",
              "--num_group", "32", "--group_size", "16",
              "--f_coreset", "1.0", "--use_pallas", "false",
              "--save_results", "false"])
    out = capsys.readouterr().out
    assert "image_rocauc" in out and "Candycane" in out


def test_fix_cross_stats_flag(rng):
    """Q1: cross-wired stats by default; fix_cross_stats=True un-wires them."""
    from cmdiad_tpu.config import Config
    from cmdiad_tpu.methods.variants import DoubleMethod

    class _BB:  # extraction never called in this test
        pass

    cfg = Config(method_name="DINO+Point_MAE", f_coreset=1.0)
    xyz = rng.normal(size=(100, 8)).astype(np.float32) * 3 + 1
    rgb = rng.normal(size=(100, 8)).astype(np.float32) * 0.5 - 2

    def build(fix):
        m = DoubleMethod(cfg, _BB(), None, fix_cross_stats=fix)
        m._bank_acc["xyz"].append(xyz)
        m._bank_acc["rgb"].append(rgb)
        m.run_coreset()
        return m.stats

    quirky = build(False)
    assert abs(quirky["xyz"][0] - xyz.mean()) < 1e-4       # mean from xyz
    assert abs(quirky["xyz"][1] - rgb.std(ddof=1)) < 1e-4  # std from rgb (Q1!)
    assert abs(quirky["rgb"][0] - xyz.mean()) < 1e-4       # mean from xyz (Q1!)

    fixed = build(True)
    assert abs(fixed["xyz"][1] - xyz.std(ddof=1)) < 1e-4
    assert abs(fixed["rgb"][0] - rgb.mean()) < 1e-4


def test_bf16_backbone_close_to_f32(rng):
    """compute_dtype=bfloat16 must track f32 features within bf16 tolerance."""
    import jax.numpy as jnp
    from cmdiad_tpu.models.backbone import DualBackbone
    from cmdiad_tpu.models.vit import ViTConfig
    from cmdiad_tpu.models.point_mae import PointMAEConfig

    def bb(dtype):
        return DualBackbone(
            vit_config=ViTConfig(img_size=32, patch_size=8, embed_dim=16,
                                 depth=2, num_heads=2),
            pm_config=PointMAEConfig(num_group=8, group_size=4,
                                     encoder_dims=8, trans_dim=8, depth=2,
                                     num_heads=2, fetch_idx=(0, 1)),
            use_pallas=False, image_size=32, compute_dtype=dtype)

    b32, b16 = bb("float32"), bb("bfloat16")
    params = b32.init_params(0)
    img = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    r32, _ = b32.rgb_patches(params, img)
    r16, _ = b16.rgb_patches(params, img)
    err = np.abs(np.asarray(r32) - np.asarray(r16))
    scale = np.abs(np.asarray(r32)).mean() + 1e-6
    assert err.mean() / scale < 0.05, err.mean() / scale


def test_cli_detect_e2e_tiny(tmp_path, rng, capsys, monkeypatch):
    """Full `detect` CLI on the synthetic dataset with the tiny backbones."""
    from cmdiad_tpu.data.synthetic import make_synthetic_dataset
    from cmdiad_tpu import cli
    root = make_synthetic_dataset(str(tmp_path / "ds"), size=64, n_train=3,
                                  n_test_good=1, n_test_bad=2)
    monkeypatch.chdir(tmp_path)
    cli.main(["detect", "--method_name", "Point_MAE",
              "--rgb_backbone_name", "tiny", "--xyz_backbone_name", "tiny",
              "--dataset_path", root, "--class_name", "widget",
              "--rgb_size", "64", "--xyz_size", "64", "--gt_size", "64",
              "--num_group", "32", "--group_size", "16",
              "--f_coreset", "0.5", "--use_pallas", "false",
              "--results_dir", str(tmp_path / "res")])
    out = capsys.readouterr().out
    assert "image_rocauc" in out and "Widget" in out
    assert (tmp_path / "res" / "aupro_results.md").exists()


def test_cli_optional_numeric_fields_parse_typed():
    """Regression: Optional[int/float] CLI args must not degrade to str."""
    import argparse
    from cmdiad_tpu import cli
    from cmdiad_tpu.config import Config, TrainConfig
    p = argparse.ArgumentParser()
    cli._add_dataclass_args(p, Config)
    args = p.parse_args(["--random_state", "7", "--f_coreset", "0.2"])
    assert args.random_state == 7 and isinstance(args.random_state, int)
    assert args.f_coreset == 0.2
    p2 = argparse.ArgumentParser()
    cli._add_dataclass_args(p2, TrainConfig)
    args2 = p2.parse_args(["--lr", "0.001"])
    assert args2.lr == 0.001 and isinstance(args2.lr, float)


def test_resume_with_grad_accumulation(rng, tmp_path):
    """Regression: MultiSteps NamedTuple state must restore by path, not
    lexicographic leaf order (mini_step/gradient_step are non-alphabetical)."""
    from cmdiad_tpu.config import TrainConfig
    from cmdiad_tpu.train.distill import DistillTrainer
    base = rng.normal(size=(16, 8, 8)).astype(np.float32)
    arrays = {"patch": np.concatenate([base, base * 0.5], axis=2)}
    cfg = TrainConfig(train_method="HallucinationCrossModality", epochs=2,
                      batch_size=4, accum_iter=2, warmup_epochs=1, blr=0.02,
                      seed=0, output_dir=str(tmp_path), save_every=1)
    DistillTrainer(cfg, feature_dim=8, arrays=arrays,
                   test_arrays=arrays).train()
    cfg2 = cfg.replace(epochs=3, resume=str(tmp_path / "checkpoint-1.npz"))
    t2 = DistillTrainer(cfg2, feature_dim=8, arrays=arrays,
                        test_arrays=arrays)
    assert t2.start_epoch == 2
    result = t2.train()
    assert np.isfinite(result.history["train_loss"]).all()
