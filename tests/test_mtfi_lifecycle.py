"""Full MTFI lifecycle: feature dumping -> distillation training -> few-modal
inference with the trained net (the reference's 3-stage workflow:
main.py dump -> hallucination_network_pretrain.py -> main.py MTFI eval)."""

import numpy as np
import pytest

from cmdiad_tpu.config import Config, TrainConfig
from cmdiad_tpu.data.synthetic import make_synthetic_dataset
from cmdiad_tpu.models.backbone import DualBackbone
from cmdiad_tpu.models.vit import ViTConfig
from cmdiad_tpu.models.point_mae import PointMAEConfig
from cmdiad_tpu.runner import CMDIADRunner
from cmdiad_tpu.train.distill import DistillTrainer, load_training_arrays

SIZE = 64
DIM = 32


def _backbone():
    return DualBackbone(
        vit_config=ViTConfig(img_size=SIZE, patch_size=8, embed_dim=DIM,
                             depth=2, num_heads=2),
        pm_config=PointMAEConfig(num_group=32, group_size=16, encoder_dims=16,
                                 trans_dim=16, depth=2, num_heads=2,
                                 fetch_idx=(0, 1)),
        use_pallas=False, image_size=SIZE)


def test_mtfi_full_lifecycle(tmp_path):
    root = make_synthetic_dataset(str(tmp_path / "ds"), size=SIZE, n_train=5,
                                  n_test_good=2, n_test_bad=2)
    bb = _backbone()
    params = bb.init_params(0)

    # ---- stage 1: dual-method run with feature dumping ---------------------
    dump = str(tmp_path / "dumps")
    cfg1 = Config(method_name="DINO+Point_MAE", dataset_path=root,
                  rgb_size=SIZE, xyz_size=SIZE, gt_size=SIZE, f_coreset=0.5,
                  save_feature_for_fusion=True, save_path=dump)
    r1 = CMDIADRunner(cfg1, backbone=bb, params=params)
    r1.fit("widget")
    r1.evaluate("widget")

    # ---- stage 2: FtoF distillation training on the dumps -------------------
    tcfg = TrainConfig(train_method="HallucinationCrossModality",
                       data_path=dump, epochs=4, batch_size=4,
                       warmup_epochs=1, blr=0.01, seed=0,
                       output_dir=str(tmp_path / "run"), save_every=2)
    arrays = load_training_arrays(tcfg, "train")
    assert arrays["patch"].shape[2] == 2 * DIM
    test_arrays = load_training_arrays(tcfg, "test")
    trainer = DistillTrainer(tcfg, feature_dim=DIM, arrays=arrays,
                             test_arrays=test_arrays)
    result = trainer.train()
    assert result.history["train_loss"][-1] < result.history["train_loss"][0]

    # ---- stage 3: few-modal inference with the trained fusion net -----------
    from cmdiad_tpu.models.hallucination import FtoFMlp
    from cmdiad_tpu.methods import registry as reg
    cfg3 = Config(method_name="WithHallucination", main_modality="xyz",
                  use_hn=True, dataset_path=root, rgb_size=SIZE,
                  xyz_size=SIZE, gt_size=SIZE, f_coreset=0.5)
    net = FtoFMlp(DIM, DIM)
    method = reg._METHODS["WithHallucination"](
        cfg3, bb, params, fusion=net,
        fusion_vars={"params": result.params})
    runner = CMDIADRunner.__new__(CMDIADRunner)
    runner.cfg = cfg3
    runner.method = method
    runner.timings = {}
    runner.fit("widget")
    metrics = runner.evaluate("widget")
    for k in ("image_rocauc", "pixel_rocauc", "au_pro"):
        assert 0.0 <= metrics[k] <= 1.0, metrics
    # the point-modality signal on synthetic dents should survive MTFI
    assert metrics["pixel_rocauc"] > 0.5, metrics
