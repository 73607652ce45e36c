"""Diagnose the system fixture's image-level signal (VERDICT r3 weak #5).

The r4 on-chip system run printed pixel_rocauc 0.997 but image_rocauc 0.48:
per-patch detection works, the cross-image ranking doesn't.  This script
fits the production config on the synthetic fixture and dumps, per test
group (good / dent / blotch), the RAW per-modality λ-weighted scores
(s_vec) next to the fused detect score and the detect fuser's coef — to
see whether the fused score drowns one modality (scale mismatch in the
OCSVM direction), whether the raw per-modality scores themselves fail to
separate, or both.  Runs the STAGED eval path (fused_eval=False) so the
pre-fusion s_vec is observable; fusion itself is the same linear form.

Usage: python benchmarks/diag_image_signal.py [out.json]
Env:   CMDIAD_SYS_CPU=1 CMDIAD_SYS_SIZE=64 for the tiny-backbone smoke.
"""

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    from cmdiad_tpu.config import Config
    from cmdiad_tpu.data.synthetic import make_synthetic_dataset
    from cmdiad_tpu.methods.registry import build_backbone
    from cmdiad_tpu.runner import CMDIADRunner

    size = int(os.environ.get("CMDIAD_SYS_SIZE", "224"))
    if os.environ.get("CMDIAD_SYS_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    n_train = int(os.environ.get("CMDIAD_SYS_TRAIN", "200"))
    n_good, n_dent, n_blotch = 8, 8, 8

    tmp = tempfile.mkdtemp(prefix="cmdiad_diag_")
    root = make_synthetic_dataset(
        tmp, class_names=("widget",), size=size, n_train=n_train,
        n_test_good=n_good, n_test_bad=n_dent, n_test_color=n_blotch)

    kwargs = dict(dataset_path=root, method_name="DINO+Point_MAE",
                  batch_size=8, compute_dtype="bfloat16", f_coreset=0.1,
                  max_sample=500, rgb_size=size, xyz_size=size, gt_size=size,
                  cache_train_features=True, fused_eval=False)
    if size != 224:
        kwargs.update(rgb_backbone_name="tiny", xyz_backbone_name="tiny",
                      num_group=32, group_size=16, use_pallas=False,
                      f_coreset=0.5)
    cfg = Config(**kwargs)
    backbone = build_backbone(cfg)
    runner = CMDIADRunner(cfg, backbone=backbone,
                          params=backbone.init_params(0))

    # capture the OCSVM calibration rows (train-image λ-weighted s vectors):
    # if one coordinate is degenerate there (e.g. in-bank patches scoring ~0),
    # the fitted direction ignores that modality at test time
    import cmdiad_tpu.methods.base as mb
    calib = {}
    orig_fit = mb.MemoryBankMethod.run_late_fusion

    def fit_hook(self):
        rows = []
        for sv, n in self.s_lib:
            sv = np.asarray(jax.device_get(sv), np.float64)[:n]
            rows.append(sv.reshape(-1, sv.shape[-1]))
        r = np.concatenate(rows, 0)
        calib["rows_mean"] = [round(float(v), 5) for v in r.mean(0)]
        calib["rows_std"] = [round(float(v), 5) for v in r.std(0)]
        calib["rows_min"] = [round(float(v), 5) for v in r.min(0)]
        calib["rows_max"] = [round(float(v), 5) for v in r.max(0)]
        calib["n_rows"] = int(r.shape[0])
        return orig_fit(self)

    mb.MemoryBankMethod.run_late_fusion = fit_hook
    try:
        runner.fit("widget")
    finally:
        mb.MemoryBankMethod.run_late_fusion = orig_fit

    m = runner.method
    rows = []
    orig = m._record_prediction_batch

    def hook(s_vec, s_maps, masks, labels, paths, _orig=orig):
        sv = np.asarray(jax.device_get(s_vec), np.float64)
        for i, (lab, p) in enumerate(zip(labels, paths)):
            rows.append({
                "path": "/".join(str(p).replace("\\", "/").split("/")[-3:]),
                "label": int(lab),
                "s_vec": [float(v) for v in sv[i]]})
        return _orig(s_vec, s_maps, masks, labels, paths)

    m._record_prediction_batch = hook
    metrics = runner.evaluate("widget")
    m._record_prediction_batch = orig

    df = m.detect_fuser
    coef = np.ravel(np.asarray(df.coef_, np.float64))
    for r in rows:
        r["fused_s"] = float(np.dot(coef, r["s_vec"]))

    out = {"backend": jax.default_backend(), "size": size,
           "n_train": n_train,
           "metrics": {k: round(v, 4) for k, v in metrics.items()},
           "detect_coef": [float(c) for c in coef],
           "detect_offset": float(np.ravel(df.offset_)[0]),
           "calibration_rows": calib,
           "groups": {}}
    for tag in ("good", "dent", "blotch"):
        g = [r for r in rows if r["path"].startswith(f"{tag}/")]
        if not g:
            continue
        sv = np.array([r["s_vec"] for r in g])
        out["groups"][tag] = {
            "n": len(g),
            "s_vec_mean": [round(float(v), 4) for v in sv.mean(0)],
            "s_vec_std": [round(float(v), 4) for v in sv.std(0)],
            "fused_s": [round(r["fused_s"], 4) for r in g],
        }
    print(json.dumps(out, indent=1))
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
