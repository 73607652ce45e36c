"""Differential parity tests against the reference's OWN torch modules.

Round-1 oracles were hand-written numpy re-implementations of the same spec —
a shared misreading would pass silently.  These tests instead build the
reference's torch modules (random-initialised, BN stats warmed by a train-mode
forward), push their real ``state_dict()`` through ``models/convert.py``, and
assert forward/loss parity of the flax rebuilds:

  * FtoF MLP / conv      models/hallucination_network.py:18-143
  * FtoI MLP / conv      models/hallucination_network.py:146-220
  * ItoF HRNet           models/hrnet.py:146-295
  * 3-NN interpolation   models/pointnet2_utils.py:45-75
  * AU-PRO               utils/au_pro_util.py:204-225
  * KNNGaussianBlur      utils/utils.py:71-83

Every converter therefore consumes a real torch state_dict at least once.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ref_oracle import ref_import
from cmdiad_tpu.models import convert
from cmdiad_tpu.models.hallucination import FtoFMlp, FtoFConv, FtoIMlp, FtoIConv
from cmdiad_tpu.models.hrnet import HRNet


def _sd(net):
    return convert.torch_state_dict_to_numpy(net.state_dict())


def _t(a):
    return torch.from_numpy(np.asarray(a))


# ---------------------------------------------------------------------------
# FtoF MLP  (HallucinationCrossModalityNetwork)
# ---------------------------------------------------------------------------

def test_ftof_mlp_parity(rng):
    hn = ref_import("models.hallucination_network")
    torch.manual_seed(0)
    ref = hn.HallucinationCrossModalityNetwork(None, 768, 768).eval()
    variables = convert.ftof_mlp_from_torch(_sd(ref))
    mine = FtoFMlp(768, 768)

    xyz = rng.normal(size=(2, 64, 768)).astype(np.float32)
    rgb = rng.normal(size=(2, 64, 768)).astype(np.float32)

    with torch.no_grad():
        ref_xyz_h = ref.hallucination_generation(
            rgb_feature=_t(rgb), out_type="xyz").numpy()
        ref_rgb_h = ref.hallucination_generation(
            xyz_feature=_t(xyz), out_type="rgb").numpy()
    my_xyz_h = np.asarray(mine.apply(variables, jnp.asarray(rgb), "xyz",
                                     method="generate"))
    my_rgb_h = np.asarray(mine.apply(variables, jnp.asarray(xyz), "rgb",
                                     method="generate"))
    np.testing.assert_allclose(my_xyz_h, ref_xyz_h, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(my_rgb_h, ref_rgb_h, atol=1e-5, rtol=1e-5)

    for dm in ("cos_dist", "l2", "smooth_l1"):
        with torch.no_grad():
            ref_lx, ref_lr = ref(_t(xyz), _t(rgb), False, dm)
        my_lx, my_lr = mine.apply(variables, jnp.asarray(xyz),
                                  jnp.asarray(rgb), dm)
        np.testing.assert_allclose(float(my_lx), float(ref_lx), rtol=2e-5)
        np.testing.assert_allclose(float(my_lr), float(ref_lr), rtol=2e-5)


# ---------------------------------------------------------------------------
# FtoF conv  (HallucinationCrossModalityConv) — BN stats warmed
# ---------------------------------------------------------------------------

def test_ftof_conv_parity(rng):
    hn = ref_import("models.hallucination_network")
    torch.manual_seed(1)
    ref = hn.HallucinationCrossModalityConv(None, 768, 768)

    xyz = rng.normal(size=(1, 3136, 768)).astype(np.float32)
    rgb = rng.normal(size=(1, 3136, 768)).astype(np.float32)

    ref.train()
    with torch.no_grad():          # warm the BN running stats
        ref(_t(xyz), _t(rgb), False, "l2")
    ref.eval()

    variables = convert.ftof_conv_from_torch(_sd(ref))
    mine = FtoFConv(768, 768)

    with torch.no_grad():
        ref_xyz_h = ref.hallucination_generation(None, _t(rgb), "xyz").numpy()
        ref_lx, ref_lr = ref(_t(xyz), _t(rgb), False, "l2")
        ref_sx, ref_sr = ref(_t(xyz), _t(rgb), True, "l2")
    my_xyz_h = np.asarray(mine.apply(variables, jnp.asarray(rgb), "xyz",
                                     method="generate"))
    np.testing.assert_allclose(my_xyz_h, ref_xyz_h, atol=2e-4, rtol=1e-4)

    my_lx, my_lr = mine.apply(variables, jnp.asarray(xyz), jnp.asarray(rgb),
                              False, False)
    np.testing.assert_allclose(float(my_lx), float(ref_lx), rtol=1e-4)
    np.testing.assert_allclose(float(my_lr), float(ref_lr), rtol=1e-4)
    my_sx, my_sr = mine.apply(variables, jnp.asarray(xyz), jnp.asarray(rgb),
                              True, False)
    np.testing.assert_allclose(float(my_sx), float(ref_sx), rtol=1e-4)
    np.testing.assert_allclose(float(my_sr), float(ref_sr), rtol=1e-4)


# ---------------------------------------------------------------------------
# FtoI MLP  (HallucinationRGBFeatureToXYZInputMLP) — incl. torch bicubic
# ---------------------------------------------------------------------------

class _Args:
    estimate_depth = False


def test_ftoi_mlp_parity(rng):
    hn = ref_import("models.hallucination_network")
    torch.manual_seed(2)
    ref = hn.HallucinationRGBFeatureToXYZInputMLP(_Args(), 768).eval()
    variables = convert.ftoi_mlp_from_torch(_sd(ref))
    mine = FtoIMlp(768)

    feat = rng.normal(size=(1, 3136, 768)).astype(np.float32)
    target = rng.normal(size=(1, 224, 224, 3)).astype(np.float32)

    with torch.no_grad():
        ref_img = ref.hallucination_generation(_t(feat)).numpy()  # (1,3,224,224)
        ref_loss = ref(_t(feat), _t(target.transpose(0, 3, 1, 2)))
    my_img = np.asarray(mine.apply(variables, jnp.asarray(feat)))  # NHWC
    np.testing.assert_allclose(my_img.transpose(0, 3, 1, 2), ref_img,
                               atol=2e-4, rtol=1e-4)
    my_loss = mine.apply(variables, jnp.asarray(feat), jnp.asarray(target),
                         method="loss")
    np.testing.assert_allclose(float(my_loss), float(ref_loss), rtol=1e-4)


def test_ftoi_conv_parity(rng):
    hn = ref_import("models.hallucination_network")
    torch.manual_seed(3)
    ref = hn.HallucinationFeatureToInputConv(None, 768).eval()
    variables = convert.ftoi_conv_from_torch(_sd(ref))
    mine = FtoIConv(768)

    feat = rng.normal(size=(1, 3136, 768)).astype(np.float32)
    target = rng.normal(size=(1, 224, 224, 3)).astype(np.float32)

    with torch.no_grad():
        ref_img = ref.hallucination_generation(_t(feat)).numpy()
        ref_loss = ref(_t(feat), _t(target.transpose(0, 3, 1, 2)))
    my_img = np.asarray(mine.apply(variables, jnp.asarray(feat)))
    np.testing.assert_allclose(my_img.transpose(0, 3, 1, 2), ref_img,
                               atol=2e-4, rtol=1e-4)
    my_loss = mine.apply(variables, jnp.asarray(feat), jnp.asarray(target),
                         method="loss")
    np.testing.assert_allclose(float(my_loss), float(ref_loss), rtol=1e-4)


# ---------------------------------------------------------------------------
# ItoF HRNet  (models/hrnet.py, as-executed truncation) — BN stats warmed
# ---------------------------------------------------------------------------

def test_hrnet_parity(rng):
    hr = ref_import("models.hrnet")
    torch.manual_seed(4)
    ref = hr.HRNet(512, 768, 0.1)

    img = rng.normal(size=(1, 224, 224, 3)).astype(np.float32)
    feat = rng.normal(size=(1, 3136, 768)).astype(np.float32)

    ref.train()
    with torch.no_grad():
        ref(_t(img.transpose(0, 3, 1, 2)), _t(feat))   # warm BN stats
    ref.eval()

    variables = convert.hrnet_from_torch(_sd(ref))
    mine = HRNet(768)

    with torch.no_grad():
        ref_grid = ref.hallucination_generation(
            _t(img.transpose(0, 3, 1, 2))).numpy()      # (1,768,56,56)
        ref_loss = ref(_t(img.transpose(0, 3, 1, 2)), _t(feat))
    my_grid = np.asarray(mine.apply(variables, jnp.asarray(img)))  # NHWC
    np.testing.assert_allclose(my_grid.transpose(0, 3, 1, 2), ref_grid,
                               atol=5e-4, rtol=1e-3)
    my_loss = mine.apply(variables, jnp.asarray(img), jnp.asarray(feat),
                         False, method="loss")
    np.testing.assert_allclose(float(my_loss), float(ref_loss), rtol=1e-4)


# ---------------------------------------------------------------------------
# 3-NN IDW interpolation  (models/pointnet2_utils.py:45-75)
# ---------------------------------------------------------------------------

def test_interpolating_points_parity(rng):
    pn = ref_import("models.pointnet2_utils")
    from cmdiad_tpu.ops.interpolate import three_nn_interpolate

    B, N, S, D = 2, 400, 128, 32
    pts = rng.normal(size=(B, N, 3)).astype(np.float32)
    ctr = rng.normal(size=(B, S, 3)).astype(np.float32)
    fts = rng.normal(size=(B, S, D)).astype(np.float32)

    with torch.no_grad():
        ref_out = pn.interpolating_points(
            _t(pts.transpose(0, 2, 1)), _t(ctr.transpose(0, 2, 1)),
            _t(fts.transpose(0, 2, 1))).numpy()        # (B, D, N)
    mask = np.ones((B, N), bool)
    mine = np.asarray(three_nn_interpolate(
        jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(ctr),
        jnp.asarray(fts)))                              # (B, N, D)
    np.testing.assert_allclose(mine.transpose(0, 2, 1), ref_out,
                               atol=1e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# AU-PRO  (utils/au_pro_util.py)
# ---------------------------------------------------------------------------

def _blob_maps(rng, n=6, side=48):
    gts, preds = [], []
    for i in range(n):
        gt = np.zeros((side, side), np.uint8)
        for _ in range(rng.integers(0, 4)):            # incl. some OK images
            r, c = rng.integers(4, side - 10, size=2)
            h, w = rng.integers(3, 9, size=2)
            gt[r:r + h, c:c + w] = 1
        score = rng.random((side, side)).astype(np.float64)
        score += gt * rng.random() * 1.5               # signal on defects
        gts.append(gt)
        preds.append(score)
    return gts, preds


@pytest.mark.parametrize("limit", [0.3, 0.01])
def test_au_pro_parity(rng, limit):
    ref_ap = ref_import("utils.au_pro_util")
    from cmdiad_tpu.metrics.au_pro import calculate_au_pro

    gts, preds = _blob_maps(rng)
    ref_val, (ref_fprs, ref_pros) = ref_ap.calculate_au_pro(
        gts, preds, integration_limit=limit)
    my_val, _ = calculate_au_pro(gts, preds, limit)
    np.testing.assert_allclose(my_val, ref_val, atol=1e-10)


# ---------------------------------------------------------------------------
# KNNGaussianBlur  (utils/utils.py:71-83)
# ---------------------------------------------------------------------------

def test_knn_gaussian_blur_parity(rng):
    """Parity with the REAL reference blur class on float score maps.

    Note what the reference actually does: torchvision ToPILImage with
    mode=None quantises the float map to uint8 ('mul(255).byte()', i.e.
    truncation) before PIL's GaussianBlur runs — the reference blur path is
    uint8-quantised end to end.  Our float path can therefore only agree to
    within quantisation noise: one truncation step (1/255 of map max) plus
    PIL's per-pass integer rounding.
    """
    uu = ref_import("utils.utils")
    from cmdiad_tpu.ops.blur import knn_gaussian_blur

    blur = uu.KNNGaussianBlur(4)
    # smooth positive score-map-like input (min-distance maps), plus blobs
    base = rng.random((224, 224)).astype(np.float32)
    base[40:80, 60:100] += 4.0
    base[150:170, 30:60] += 2.5
    s_map = np.asarray(knn_gaussian_blur(jnp.asarray(base), 2.0))  # smooth it
    map_max = float(s_map.max())

    ref_out = blur(_t(s_map[None])).numpy()[0]
    mine = np.asarray(knn_gaussian_blur(jnp.asarray(s_map), 4.0))

    err = np.abs(mine - ref_out)
    assert err.max() <= 3.0 / 255.0 * map_max, err.max()
    assert err.mean() <= 0.75 / 255.0 * map_max, err.mean()


def test_quantized_knn_gaussian_blur_bit_exact(rng):
    """quantized_knn_gaussian_blur reproduces the reference's uint8 path
    (truncating ToPILImage + Pillow's fixed-point per-pass-rounded box blur)
    to ZERO tolerance — the checkpoint-parity eval mode (cfg.quantized_blur).
    """
    uu = ref_import("utils.utils")
    from cmdiad_tpu.ops.blur import quantized_knn_gaussian_blur

    blur = uu.KNNGaussianBlur(4)
    for i in range(3):
        base = (np.random.default_rng(i).random((224, 224))
                .astype(np.float32) * (3.0 + 5.0 * i))
        base[40 + i:80, 60:100 + i] += 4.0 * (i + 1)
        ref_out = blur(_t(base[None, None])).numpy()[0]
        mine = np.asarray(quantized_knn_gaussian_blur(jnp.asarray(base)))
        np.testing.assert_array_equal(mine, ref_out)


# ---------------------------------------------------------------------------
# PatchCore scoring core  (features.py:225-297 compute_single_s_s_map)
# ---------------------------------------------------------------------------

def test_compute_single_s_s_map_parity(rng):
    """ops.scoring.patchcore_score vs the reference's own scoring method.

    The reference Features class cannot be constructed here (its __init__
    builds the CUDA backbone stack), so a bare instance is materialised with
    exactly the attributes compute_single_s_s_map touches: the bank, the
    l2 calculate_dist config, n_reweight, gt_size and the real
    KNNGaussianBlur.  This replaces the hand-written numpy eq.7 oracle as
    the authority for the min-dist -> argmax -> eq.7 reweight -> bilinear ->
    blur chain.
    """
    import types
    from ref_oracle import ref_import_features
    from cmdiad_tpu.ops.scoring import patchcore_score

    feats_mod = ref_import_features()
    uu = ref_import("utils.utils")

    n_patch, d, n_bank = 196, 32, 600          # 14x14 feature grid
    patch = rng.normal(size=(n_patch, d)).astype(np.float32)
    bank = rng.normal(size=(n_bank, d)).astype(np.float32)
    # make one patch clearly anomalous so argmax is stable across fp noise
    patch[57] += 3.0

    ref = feats_mod.Features.__new__(feats_mod.Features)
    torch.nn.Module.__init__(ref)   # skip Features.__init__ (CUDA stack)
    ref.patch_xyz_lib = _t(bank)
    ref.n_reweight = 3
    ref.gt_size = 224
    ref.blur = uu.KNNGaussianBlur(4)
    ref.args = types.SimpleNamespace(dist_method_s="l2")
    dist = torch.cdist(_t(patch), ref.patch_xyz_lib)
    s_ref, smap_ref = ref.compute_single_s_s_map(
        _t(patch), dist, (14, 14), modal="xyz")
    smap_ref = smap_ref.squeeze().numpy()

    s, smap = patchcore_score(jnp.asarray(patch), jnp.asarray(bank),
                              (14, 14))
    s, smap = float(s), np.asarray(smap)

    assert abs(s - float(s_ref)) <= 1e-4 * max(abs(float(s_ref)), 1.0)
    # the reference blur path quantises to uint8 inside ToPILImage; our
    # float path agrees within quantisation noise (same bound as
    # test_knn_gaussian_blur_parity)
    map_max = max(smap.max(), smap_ref.max())
    err = np.abs(smap - smap_ref)
    assert err.max() <= 3.0 / 255.0 * map_max, err.max()
    assert err.mean() <= 0.75 / 255.0 * map_max, err.mean()
