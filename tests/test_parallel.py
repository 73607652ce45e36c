"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cmdiad_tpu.parallel.mesh import make_mesh, shard_batch, replicate, shard_rows
from cmdiad_tpu.parallel.eval import dp_score_batch, sharded_bank_min_dist
from cmdiad_tpu.ops.scoring import patchcore_score


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        # CMDIAD_TEST_ON_TPU runs see the single real chip; the mesh
        # numerics are covered by the virtual-CPU-mesh run and the
        # kernel-inside-shard_map TPU coverage lives in test_tpu_only.py
        pytest.skip("needs 8 devices (virtual CPU mesh)")
    return make_mesh((8,), ("data",))


def test_dp_score_batch_matches_sequential(rng, mesh):
    b, npatch, d = 8, 64, 16
    patches = rng.normal(size=(b, npatch, d)).astype(np.float32)
    bank = rng.normal(size=(500, d)).astype(np.float32)

    s_dp, m_dp = dp_score_batch(mesh, jnp.asarray(patches), jnp.asarray(bank),
                                feat_hw=(8, 8), out_size=32)

    for i in range(b):
        s_i, m_i = patchcore_score(jnp.asarray(patches[i]), jnp.asarray(bank),
                                   (8, 8), out_size=32)
        np.testing.assert_allclose(float(s_dp[i]), float(s_i), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(m_dp[i]), np.asarray(m_i),
                                   rtol=1e-3, atol=1e-4)


def test_sharded_bank_min_dist_matches_dense(rng, mesh):
    patch = rng.normal(size=(64, 16)).astype(np.float32)
    bank = rng.normal(size=(800, 16)).astype(np.float32)
    mv, mi = sharded_bank_min_dist(mesh, jnp.asarray(patch), jnp.asarray(bank))
    d = np.linalg.norm(patch[:, None] - bank[None], axis=-1)
    np.testing.assert_allclose(np.asarray(mv), d.min(1), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(mi), d.argmin(1))


def test_mesh_helpers(rng, mesh):
    batch = {"x": rng.normal(size=(16, 4)).astype(np.float32), "n": 3}
    sharded = shard_batch(mesh, batch)
    assert sharded["x"].sharding.spec == jax.sharding.PartitionSpec("data", None)
    rep = replicate(mesh, {"w": np.ones((3, 3), np.float32)})
    assert rep["w"].sharding.spec == jax.sharding.PartitionSpec()
    rows = shard_rows(mesh, jnp.ones((32, 5)))
    assert rows.sharding.spec == jax.sharding.PartitionSpec("data", None)


def test_graft_entry_dryrun():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_sharded_coreset_matches_dense(rng, mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P
    from cmdiad_tpu.ops.coreset import greedy_kcenter
    z = rng.normal(size=(4000, 32)).astype(np.float32)
    ref = np.asarray(greedy_kcenter(jnp.asarray(z), 100, compute_dtype="FP32"))
    zs = jax.device_put(z, NamedSharding(mesh, P("data", None)))
    with mesh:
        got = np.asarray(greedy_kcenter(zs, 100, compute_dtype="FP32"))
    np.testing.assert_array_equal(ref, got)


def test_e2e_dp_eval_matches_single_device(rng, tmp_path_factory):
    """cfg.mesh_shape=(8,) (data-parallel eval: extraction + scoring sharded
    over the mesh) must match the single-device run end to end."""
    from cmdiad_tpu.config import Config
    from cmdiad_tpu.data.synthetic import make_synthetic_dataset
    from cmdiad_tpu.models.backbone import DualBackbone
    from cmdiad_tpu.models.vit import ViTConfig
    from cmdiad_tpu.models.point_mae import PointMAEConfig
    from cmdiad_tpu.runner import CMDIADRunner

    root = make_synthetic_dataset(
        str(tmp_path_factory.mktemp("synth_dp")), size=64, n_train=5,
        n_test_good=2, n_test_bad=3)
    bb = DualBackbone(
        vit_config=ViTConfig(img_size=64, patch_size=8, embed_dim=32,
                             depth=2, num_heads=2),
        pm_config=PointMAEConfig(num_group=32, group_size=16, encoder_dims=16,
                                 trans_dim=16, depth=2, num_heads=2,
                                 fetch_idx=(0, 1)),
        use_pallas=False, image_size=64)
    params = bb.init_params(0)

    def run(mesh_shape):
        cfg = Config(method_name="DINO+Point_MAE", dataset_path=root,
                     rgb_size=64, xyz_size=64, gt_size=64, f_coreset=0.5,
                     max_sample=10, batch_size=8, mesh_shape=mesh_shape)
        r = CMDIADRunner(cfg, backbone=bb, params=params)
        r.fit("widget")
        return r.evaluate("widget"), r

    m1, _ = run(())
    m8, r8 = run((8,))
    for k in m1:
        assert abs(m1[k] - m8[k]) < 5e-3, (k, m1, m8)

    # the DP run must have used the ONE-dispatch shard_map predict program
    # (not a silent fallback), and its per-batch outputs must match the
    # staged DP chain at rounding tolerance against the same fitted state
    from cmdiad_tpu.data.loader import iter_samples, stack_batches
    from cmdiad_tpu.data.mvtec3d import MVTec3DDataset
    from cmdiad_tpu.methods.base import _fuse_predict
    m = r8.method
    assert not m._fused_eval_ready()     # mesh path, not the 1-device one
    ds = MVTec3DDataset(root, "widget", "test", rgb_size=64, xyz_size=64,
                        gt_size=64)
    batch = next(stack_batches(iter_samples(ds), 8))
    fn, mods = m._fused_dp_fn(batch)
    assert fn is not None
    s_dp, fused_dp = fn(m.params, m._device_batch(batch),
                        m._fused_bank_args(mods), *m._fuser_weights())
    m.cfg = m.cfg.replace(fused_eval=False)
    s_vec, maps = m._scores_batch(batch)           # staged sharded chain
    s_st, fused_st = _fuse_predict(s_vec, maps, *m._fuser_weights())
    np.testing.assert_allclose(np.asarray(s_dp), np.asarray(s_st),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fused_dp), np.asarray(fused_st),
                               rtol=1e-4, atol=1e-5)


def test_e2e_mtfi_dp_eval_matches_single_device(rng, tmp_path_factory):
    """MTFI (FtoF) under cfg.mesh_shape=(8,): metrics match the
    single-device run, and the ONE-dispatch shard_map MTFI predict program
    (extraction -> hallucination -> dual scoring -> λ-stack -> fusion,
    methods/base._fused_mtfi_eval_dp_fn) is actually selected."""
    from cmdiad_tpu.config import Config
    from cmdiad_tpu.data.synthetic import make_synthetic_dataset
    from cmdiad_tpu.data.loader import iter_samples, stack_batches
    from cmdiad_tpu.data.mvtec3d import MVTec3DDataset
    from cmdiad_tpu.models.backbone import DualBackbone
    from cmdiad_tpu.models.vit import ViTConfig
    from cmdiad_tpu.models.point_mae import PointMAEConfig
    from cmdiad_tpu.models.hallucination import FtoFMlp
    from cmdiad_tpu.methods.registry import _METHODS
    from cmdiad_tpu.runner import CMDIADRunner

    root = make_synthetic_dataset(
        str(tmp_path_factory.mktemp("synth_mtfi_dp")), size=64, n_train=5,
        n_test_good=2, n_test_bad=3)
    bb = DualBackbone(
        vit_config=ViTConfig(img_size=64, patch_size=8, embed_dim=32,
                             depth=1, num_heads=2),
        pm_config=PointMAEConfig(num_group=32, group_size=16, encoder_dims=16,
                                 trans_dim=16, depth=1, num_heads=2,
                                 fetch_idx=(0,)),
        use_pallas=False, image_size=64)
    params = bb.init_params(0)
    net = FtoFMlp(16, 32)
    fusion_vars = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 16)),
                           jnp.zeros((1, 4, 32)))

    def run(mesh_shape):
        cfg = Config(method_name="WithHallucination", dataset_path=root,
                     main_modality="xyz", use_hn=True,
                     rgb_size=64, xyz_size=64, gt_size=64, f_coreset=0.5,
                     max_sample=10, batch_size=8, mesh_shape=mesh_shape)
        method = _METHODS["WithHallucination"](
            cfg, bb, params, fusion=net, fusion_vars=fusion_vars)
        r = CMDIADRunner.__new__(CMDIADRunner)
        r.cfg, r.method, r.timings = cfg, method, {}
        r.fit("widget")
        return r.evaluate("widget"), r

    m1, _ = run(())
    m8, r8 = run((8,))
    for k in m1:
        assert abs(m1[k] - m8[k]) < 5e-3, (k, m1, m8)

    m = r8.method
    assert not m._fused_eval_ready()
    ds = MVTec3DDataset(root, "widget", "test", rgb_size=64, xyz_size=64,
                        gt_size=64)
    batch = next(stack_batches(iter_samples(ds), 8))
    fn, main = m._fused_dp_fn(batch)
    assert fn is not None
    s_dp, fused_dp = fn(m.params, m._fused_inputs(batch), m.fusion_vars,
                        m._fused_bank_args(main), *m._fuser_weights())
    assert np.isfinite(np.asarray(s_dp)).all()
    from cmdiad_tpu.methods.base import _fuse_predict
    m.cfg = m.cfg.replace(fused_eval=False)
    s_vec, maps = m._scores_batch(batch)            # staged sharded chain
    s_st, fused_st = _fuse_predict(s_vec, maps, *m._fuser_weights())
    np.testing.assert_allclose(np.asarray(s_dp), np.asarray(s_st),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fused_dp), np.asarray(fused_st),
                               rtol=1e-4, atol=1e-5)


def test_e2e_sharded_bank_scoring(rng, tmp_path_factory):
    """Full Point_MAE method with shard_bank=True matches replicated banks."""
    from cmdiad_tpu.config import Config
    from cmdiad_tpu.data.synthetic import make_synthetic_dataset
    from cmdiad_tpu.data.mvtec3d import MVTec3DDataset
    from cmdiad_tpu.models.backbone import DualBackbone
    from cmdiad_tpu.models.vit import ViTConfig
    from cmdiad_tpu.models.point_mae import PointMAEConfig
    from cmdiad_tpu.methods.registry import _METHODS

    root = make_synthetic_dataset(
        str(tmp_path_factory.mktemp("synth_shard")), size=64, n_train=4)
    bb = DualBackbone(
        vit_config=ViTConfig(img_size=64, patch_size=8, embed_dim=16,
                             depth=1, num_heads=2),
        pm_config=PointMAEConfig(num_group=16, group_size=8, encoder_dims=8,
                                 trans_dim=8, depth=1, num_heads=2,
                                 fetch_idx=(0,)),
        use_pallas=False, image_size=64)
    params = bb.init_params(0)

    def run(shard):
        cfg = Config(method_name="Point_MAE", dataset_path=root, rgb_size=64,
                     xyz_size=64, gt_size=64, f_coreset=0.5, max_sample=10,
                     shard_bank=shard)
        m = _METHODS["Point_MAE"](cfg, bb, params)
        ds = MVTec3DDataset(root, "widget", "train", 64, 64, 64)
        for s in ds:
            m.add_sample_to_mem_bank(s, "widget")
        m.run_coreset()
        tds = MVTec3DDataset(root, "widget", "test", 64, 64, 64)
        s0 = tds.load(0)
        out = m.extract(s0)
        return m.score_patch(out["xyz_patch"], "xyz")

    s_rep, m_rep = run(False)
    s_sh, m_sh = run(True)
    np.testing.assert_allclose(float(s_rep), float(s_sh), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(m_rep), np.asarray(m_sh),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("batch_size", [8, 6])
def test_e2e_fused_eval_sharded_bank(rng, tmp_path_factory, batch_size):
    """cfg.shard_bank + cfg.fused_eval (VERDICT r4 #8): the whole-chain
    ONE-dispatch program over ROW-SHARDED banks must engage (not silently
    fall back) and match the staged sharded chain at rounding tolerance —
    on a mesh-divisible batch (extraction sharded over 'data') and a
    non-divisible one (extraction replicated inside shard_map)."""
    from cmdiad_tpu.config import Config
    from cmdiad_tpu.data.synthetic import make_synthetic_dataset
    from cmdiad_tpu.data.loader import iter_samples, stack_batches
    from cmdiad_tpu.data.mvtec3d import MVTec3DDataset
    from cmdiad_tpu.models.backbone import DualBackbone
    from cmdiad_tpu.models.vit import ViTConfig
    from cmdiad_tpu.models.point_mae import PointMAEConfig
    from cmdiad_tpu.methods.base import _fuse_predict
    from cmdiad_tpu.runner import CMDIADRunner
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices (virtual CPU mesh)")

    root = make_synthetic_dataset(
        str(tmp_path_factory.mktemp("synth_sbf")), size=64, n_train=5,
        n_test_good=2, n_test_bad=3)
    bb = DualBackbone(
        vit_config=ViTConfig(img_size=64, patch_size=8, embed_dim=32,
                             depth=1, num_heads=2),
        pm_config=PointMAEConfig(num_group=16, group_size=8, encoder_dims=16,
                                 trans_dim=16, depth=1, num_heads=2,
                                 fetch_idx=(0,)),
        use_pallas=False, image_size=64)
    params = bb.init_params(0)

    cfg = Config(method_name="DINO+Point_MAE", dataset_path=root,
                 rgb_size=64, xyz_size=64, gt_size=64, f_coreset=0.5,
                 max_sample=10, batch_size=batch_size, shard_bank=True)
    r = CMDIADRunner(cfg, backbone=bb, params=params)
    r.fit("widget")
    metrics = r.evaluate("widget")
    for k in ("image_rocauc", "pixel_rocauc", "au_pro"):
        assert 0.0 <= metrics[k] <= 1.0

    m = r.method
    assert not m._fused_eval_ready()      # sharded-bank path, not 1-device
    ds = MVTec3DDataset(root, "widget", "test", rgb_size=64, xyz_size=64,
                        gt_size=64)
    batch = next(stack_batches(iter_samples(ds), batch_size))
    fn, mods = m._fused_shard_bank_fn(batch)
    assert fn is not None                 # the fused program engaged
    s_f, fused_f = fn(m.params, m._device_batch(batch),
                      m._fused_bank_args(mods), *m._fuser_weights())
    m.cfg = m.cfg.replace(fused_eval=False)
    s_vec, maps = m._scores_batch(batch)  # staged sharded chain
    s_st, fused_st = _fuse_predict(s_vec, maps, *m._fuser_weights())
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_st),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fused_f), np.asarray(fused_st),
                               rtol=1e-4, atol=1e-5)


def test_e2e_mtfi_fused_eval_sharded_bank(rng, tmp_path_factory):
    """MTFI (FtoF) with cfg.shard_bank + cfg.fused_eval: the whole-chain
    ONE-dispatch program (main-modality extraction + in-program
    hallucination under shard_map, sharded per-bank min, GSPMD tail) must
    engage and match the staged sharded chain."""
    from cmdiad_tpu.config import Config
    from cmdiad_tpu.data.synthetic import make_synthetic_dataset
    from cmdiad_tpu.data.loader import iter_samples, stack_batches
    from cmdiad_tpu.data.mvtec3d import MVTec3DDataset
    from cmdiad_tpu.models.backbone import DualBackbone
    from cmdiad_tpu.models.vit import ViTConfig
    from cmdiad_tpu.models.point_mae import PointMAEConfig
    from cmdiad_tpu.models.hallucination import FtoFMlp
    from cmdiad_tpu.methods.base import _fuse_predict
    from cmdiad_tpu.methods.registry import _METHODS
    from cmdiad_tpu.runner import CMDIADRunner
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices (virtual CPU mesh)")

    root = make_synthetic_dataset(
        str(tmp_path_factory.mktemp("synth_mtfi_sb")), size=64, n_train=5,
        n_test_good=2, n_test_bad=3)
    bb = DualBackbone(
        vit_config=ViTConfig(img_size=64, patch_size=8, embed_dim=32,
                             depth=1, num_heads=2),
        pm_config=PointMAEConfig(num_group=16, group_size=8, encoder_dims=16,
                                 trans_dim=16, depth=1, num_heads=2,
                                 fetch_idx=(0,)),
        use_pallas=False, image_size=64)
    params = bb.init_params(0)
    net = FtoFMlp(16, 32)
    fusion_vars = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 16)),
                           jnp.zeros((1, 4, 32)))

    cfg = Config(method_name="WithHallucination", dataset_path=root,
                 main_modality="xyz", use_hn=True,
                 rgb_size=64, xyz_size=64, gt_size=64, f_coreset=0.5,
                 max_sample=10, batch_size=8, shard_bank=True)
    method = _METHODS["WithHallucination"](
        cfg, bb, params, fusion=net, fusion_vars=fusion_vars)
    r = CMDIADRunner.__new__(CMDIADRunner)
    r.cfg, r.method, r.timings = cfg, method, {}
    r.fit("widget")
    metrics = r.evaluate("widget")
    for k in ("image_rocauc", "pixel_rocauc", "au_pro"):
        assert 0.0 <= metrics[k] <= 1.0

    m = r.method
    assert not m._fused_eval_ready()
    ds = MVTec3DDataset(root, "widget", "test", rgb_size=64, xyz_size=64,
                        gt_size=64)
    batch = next(stack_batches(iter_samples(ds), 8))
    fn, main = m._fused_shard_bank_fn(batch)
    assert fn is not None                 # the fused program engaged
    s_f, fused_f = fn(m.params, m._fused_inputs(batch), m.fusion_vars,
                      m._fused_bank_args(main), *m._fuser_weights())
    m.cfg = m.cfg.replace(fused_eval=False)
    s_vec, maps = m._scores_batch(batch)  # staged sharded chain
    s_st, fused_st = _fuse_predict(s_vec, maps, *m._fuser_weights())
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_st),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fused_f), np.asarray(fused_st),
                               rtol=1e-4, atol=1e-5)


def test_state_round_trip_sharded_bank(rng, tmp_path_factory):
    """save_state/load_state across the row-sharded placement: the loaded
    bank re-takes its P('data') sharding on this process's mesh and scores
    identically (serving from a bank cache must work multi-chip too)."""
    from cmdiad_tpu.config import Config
    from cmdiad_tpu.data.synthetic import make_synthetic_dataset
    from cmdiad_tpu.data.mvtec3d import MVTec3DDataset
    from cmdiad_tpu.models.backbone import DualBackbone
    from cmdiad_tpu.models.vit import ViTConfig
    from cmdiad_tpu.models.point_mae import PointMAEConfig
    from cmdiad_tpu.methods.registry import _METHODS

    root = make_synthetic_dataset(
        str(tmp_path_factory.mktemp("synth_state")), size=64, n_train=4)
    bb = DualBackbone(
        vit_config=ViTConfig(img_size=64, patch_size=8, embed_dim=16,
                             depth=1, num_heads=2),
        pm_config=PointMAEConfig(num_group=16, group_size=8, encoder_dims=8,
                                 trans_dim=8, depth=1, num_heads=2,
                                 fetch_idx=(0,)),
        use_pallas=False, image_size=64)
    params = bb.init_params(0)
    cfg = Config(method_name="Point_MAE", dataset_path=root, rgb_size=64,
                 xyz_size=64, gt_size=64, f_coreset=0.5, max_sample=10,
                 shard_bank=True)

    m = _METHODS["Point_MAE"](cfg, bb, params)
    ds = MVTec3DDataset(root, "widget", "train", 64, 64, 64)
    for s in ds:
        m.add_sample_to_mem_bank(s, "widget")
    m.run_coreset()
    calib = np.abs(np.asarray(rng.normal(1.0, 0.3, size=(20, 1))))
    m.detect_fuser.fit(calib)
    m.seg_fuser.fit(calib)

    path = str(tmp_path_factory.mktemp("cache") / "widget.npz")
    m.save_state(path)

    m2 = _METHODS["Point_MAE"](cfg, bb, params)
    m2.load_state(path)
    assert m2.bank_sizes == m.bank_sizes and m2.stats == m.stats
    # the restored bank is row-sharded over the mesh 'data' axis again
    spec = m2.banks["xyz"].sharding.spec
    assert tuple(spec)[0] == "data", spec

    tds = MVTec3DDataset(root, "widget", "test", 64, 64, 64)
    out = m.extract(tds.load(0))
    s1, map1 = m.score_patch(out["xyz_patch"], "xyz")
    s2, map2 = m2.score_patch(out["xyz_patch"], "xyz")
    np.testing.assert_allclose(float(s1), float(s2), rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(map1), np.asarray(map2))
