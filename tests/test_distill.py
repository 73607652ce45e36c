"""MTFI distillation training: loss decreases, accumulation, resume, DP mesh."""

import numpy as np
import pytest
import jax

from cmdiad_tpu.config import TrainConfig
from cmdiad_tpu.train.distill import DistillTrainer, build_train_setup


def _ftof_arrays(rng, n=32, tokens=16, dim=8):
    # correlated xyz/rgb halves so there is something to distil
    base = rng.normal(size=(n, tokens, dim)).astype(np.float32)
    xyz = base + 0.05 * rng.normal(size=base.shape).astype(np.float32)
    rgb = 0.5 * base + 0.05 * rng.normal(size=base.shape).astype(np.float32)
    return {"patch": np.concatenate([xyz, rgb], axis=2)}


def _cfg(**kw):
    base = dict(train_method="HallucinationCrossModality", epochs=3,
                batch_size=8, warmup_epochs=1, blr=0.02, seed=0,
                output_dir="", save_every=100)
    base.update(kw)
    return TrainConfig(**base)


def test_ftof_training_reduces_loss(rng):
    arrays = _ftof_arrays(rng)
    trainer = DistillTrainer(_cfg(), feature_dim=8, arrays=arrays,
                             test_arrays=_ftof_arrays(rng, n=8))
    result = trainer.train()
    assert result.history["train_loss"][-1] < result.history["train_loss"][0]
    assert np.isfinite(result.history["test_loss"]).all()


def test_grad_accumulation_runs(rng):
    arrays = _ftof_arrays(rng, n=32)
    trainer = DistillTrainer(_cfg(accum_iter=2, batch_size=4, epochs=2),
                             feature_dim=8, arrays=arrays,
                             test_arrays=_ftof_arrays(rng, n=8))
    result = trainer.train()
    assert len(result.history["train_loss"]) == 2


def test_checkpoint_and_resume(rng, tmp_path):
    arrays = _ftof_arrays(rng)
    test_arrays = _ftof_arrays(rng, n=8)
    cfg = _cfg(epochs=2, output_dir=str(tmp_path), save_every=1)
    t1 = DistillTrainer(cfg, feature_dim=8, arrays=arrays,
                        test_arrays=test_arrays)
    t1.train()

    cfg2 = cfg.replace(epochs=3, resume=str(tmp_path / "checkpoint-1.npz"))
    t2 = DistillTrainer(cfg2, feature_dim=8, arrays=arrays,
                        test_arrays=test_arrays)
    assert t2.start_epoch == 2
    result = t2.train()
    assert len(result.history["train_loss"]) == 1  # epochs 2..2


def test_dp_mesh_training_matches_single_device(rng):
    """8-way data-parallel training must match single-device numerics."""
    arrays = _ftof_arrays(rng, n=32)
    test_arrays = _ftof_arrays(rng, n=8)
    r1 = DistillTrainer(_cfg(epochs=2, mesh_shape=(1,)), feature_dim=8,
                        arrays=arrays, test_arrays=test_arrays).train()
    n_dev = len(jax.devices())
    assert n_dev >= 8, "conftest should provide 8 virtual devices"
    r8 = DistillTrainer(_cfg(epochs=2, mesh_shape=(8,)), feature_dim=8,
                        arrays=arrays, test_arrays=test_arrays).train()
    np.testing.assert_allclose(r1.history["train_loss"],
                               r8.history["train_loss"], rtol=1e-4)


def test_nan_abort(rng):
    arrays = _ftof_arrays(rng)
    arrays["patch"][0, 0, 0] = np.nan
    trainer = DistillTrainer(_cfg(epochs=1), feature_dim=8, arrays=arrays,
                             test_arrays=_ftof_arrays(rng, n=8))
    with pytest.raises(FloatingPointError):
        trainer.train()


@pytest.mark.parametrize("tm,dim", [
    ("HallucinationCrossModalityConv", 768),
    ("RGBFeatureToXYZInputConv", 768),
    ("RGBInputToXYZFeatureHRNET", 768),
])
def test_other_train_methods_one_step(rng, tm, dim):
    """One tiny step through the conv/HRNet paths (batch_stats plumbing)."""
    cfg = _cfg(train_method=tm, epochs=1, batch_size=2, blr=0.001)
    if tm == "HallucinationCrossModalityConv":
        arrays = {"patch": rng.normal(size=(4, 3136, 2 * dim)).astype(np.float32)}
    elif tm == "RGBFeatureToXYZInputConv":
        arrays = {"feature": rng.normal(size=(4, 3136, dim)).astype(np.float32),
                  "target": rng.normal(size=(4, 224, 224, 3)).astype(np.float32)}
    else:
        arrays = {"image": rng.normal(size=(4, 224, 224, 3)).astype(np.float32),
                  "feature": rng.normal(size=(4, 3136, dim)).astype(np.float32)}
    trainer = DistillTrainer(cfg, feature_dim=dim, arrays=arrays,
                             test_arrays=arrays)
    result = trainer.train()
    assert np.isfinite(result.history["train_loss"]).all()


def test_auto_resume(rng, tmp_path):
    """resume='auto' picks the newest checkpoint; fresh start when none."""
    arrays = _ftof_arrays(rng)
    test_arrays = _ftof_arrays(rng, n=8)
    cfg = _cfg(epochs=2, output_dir=str(tmp_path), save_every=1,
               resume="auto")
    t0 = DistillTrainer(cfg, feature_dim=8, arrays=arrays,
                        test_arrays=test_arrays)
    assert t0.start_epoch == 0      # nothing to resume yet
    t0.train()
    t1 = DistillTrainer(cfg.replace(epochs=4), feature_dim=8, arrays=arrays,
                        test_arrays=test_arrays)
    assert t1.start_epoch == 2      # resumed from checkpoint-1


@pytest.mark.parametrize("tm", ["RGBFeatureToXYZInputMLP",
                                "XYZFeatureToRGBInputMLP",
                                "XYZInputToRGBFeatureHRNET"])
def test_remaining_train_methods_one_step(rng, tm):
    """Remaining FtoI-MLP / XYZ-flavour training paths (one tiny step)."""
    cfg = _cfg(train_method=tm, epochs=1, batch_size=2, blr=0.001)
    if "InputMLP" in tm:
        arrays = {"feature": rng.normal(size=(4, 3136, 768)).astype(np.float32),
                  "target": rng.normal(size=(4, 224, 224, 3)).astype(np.float32)}
    else:
        arrays = {"image": rng.normal(size=(4, 224, 224, 3)).astype(np.float32),
                  "feature": rng.normal(size=(4, 3136, 768)).astype(np.float32)}
    trainer = DistillTrainer(cfg, feature_dim=768, arrays=arrays,
                             test_arrays=arrays)
    result = trainer.train()
    assert np.isfinite(result.history["train_loss"]).all()
