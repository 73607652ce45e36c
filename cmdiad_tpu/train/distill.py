"""MTFI cross-modal distillation training.

Reimplements ``hallucination_network_pretrain.py`` TPU-first:

  * data: npz FeatureStore dumps stacked into host arrays, per-epoch
    deterministic shuffling (reference seed 3407, pretrain:53);
  * model selection by train_method (pretrain:242-257);
  * Adam with the linear-warmup-then-constant schedule
    (utils/lr_sched.py:4-17) and lr = blr·eff_batch/256 when unset
    (pretrain:233-234); gradient accumulation via optax.MultiSteps
    (pretrain:98-152);
  * NaN/Inf loss aborts (pretrain:144-146);
  * checkpoint every ``save_every`` epochs + working resume (the reference's
    resume is broken — quirk Q7);
  * scaling: one jitted train_step with the batch sharded over the mesh's
    'data' axis (NamedSharding) — XLA inserts the gradient psums over ICI;
    optionally the MLP hidden dimension is sharded over 'model' (TP).

The train step is a pure function; BatchNorm variants carry a batch_stats
collection through the step.
"""

from __future__ import annotations

import dataclasses
import math
import time
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from cmdiad_tpu.config import TrainConfig
from cmdiad_tpu.data.feature_store import FeatureStore
from cmdiad_tpu.models.hallucination import FtoFMlp, FtoFConv, FtoIMlp, FtoIConv
from cmdiad_tpu.models.hrnet import HRNet
from cmdiad_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from cmdiad_tpu.train.checkpoint import (
    save_pytree, load_pytree, load_meta, load_flat, restore_into)
from cmdiad_tpu.utils.logging import get_logger

log = get_logger(__name__)


def warmup_constant_lr(base_lr: float, warmup_epochs: float,
                       steps_per_epoch: int) -> Callable:
    """reference utils/lr_sched.adjust_learning_rate semantics."""
    def schedule(step):
        epoch = step / max(steps_per_epoch, 1)
        return jnp.where(epoch < warmup_epochs,
                         base_lr * epoch / max(warmup_epochs, 1e-9),
                         base_lr)
    return schedule


# ---------------------------------------------------------------------------
# model zoo + per-method batch/loss plumbing
# ---------------------------------------------------------------------------

def _to_channels_last(img: np.ndarray) -> np.ndarray:
    """Accept (N,3,H,W) reference-layout dumps or (N,H,W,3)."""
    if img.ndim == 4 and img.shape[1] == 3 and img.shape[-1] != 3:
        return np.transpose(img, (0, 2, 3, 1))
    return img


def build_train_setup(cfg: TrainConfig, feature_dim: int = 768):
    """-> (module, init_args, loss_fn(vars, batch, train) -> (loss, aux))."""
    tm = cfg.train_method
    dtype = jnp.dtype(cfg.compute_dtype)
    if tm == "HallucinationCrossModality":
        rgb_dim = 384 if cfg.rgb_backbone == "dino_small" else feature_dim
        net = FtoFMlp(feature_dim, rgb_dim, mlp_depth=cfg.mlp_depth, dtype=dtype)
        init_args = (jnp.zeros((1, 4, feature_dim)), jnp.zeros((1, 4, rgb_dim)))

        def loss_fn(variables, batch, train):
            xyz = batch["patch"][:, :, :feature_dim]
            rgb = batch["patch"][:, :, feature_dim:]
            lx, lr = net.apply(variables, xyz, rgb, cfg.dist_method)
            return lx + lr, {"loss_xyz": lx, "loss_rgb": lr}
        return net, init_args, loss_fn, ("patch",)

    if tm == "HallucinationCrossModalityConv":
        net = FtoFConv(feature_dim, feature_dim, dtype=dtype)
        init_args = (jnp.zeros((1, 3136, feature_dim)),
                     jnp.zeros((1, 3136, feature_dim)))

        def loss_fn(variables, batch, train):
            xyz = batch["patch"][:, :, :feature_dim]
            rgb = batch["patch"][:, :, feature_dim:]
            if train:
                (lx, lr), updates = net.apply(
                    variables, xyz, rgb, cfg.sigmoid_loss, True,
                    mutable=["batch_stats"])
                return lx + lr, {"loss_xyz": lx, "loss_rgb": lr,
                                 "batch_stats": updates["batch_stats"]}
            lx, lr = net.apply(variables, xyz, rgb, cfg.sigmoid_loss, False)
            return lx + lr, {"loss_xyz": lx, "loss_rgb": lr}
        return net, init_args, loss_fn, ("patch",)

    if tm in ("RGBFeatureToXYZInputMLP", "XYZFeatureToRGBInputMLP",
              "RGBFeatureToXYZInputConv", "XYZFeatureToRGBInputConv"):
        out_ch = 1 if cfg.estimate_depth else 3
        if tm.endswith("MLP"):
            net = FtoIMlp(feature_dim, out_channels=out_ch, dtype=dtype)
        else:
            net = FtoIConv(feature_dim, out_channels=out_ch, dtype=dtype)
        init_args = (jnp.zeros((1, 3136, feature_dim)),)

        def loss_fn(variables, batch, train):
            loss = net.apply(variables, batch["feature"], batch["target"],
                             method="loss")
            return loss, {}
        return net, init_args, loss_fn, ("feature", "target")

    if tm in ("RGBInputToXYZFeatureHRNET", "XYZInputToRGBFeatureHRNET"):
        net = HRNet(feature_dim, dtype=dtype)
        init_args = (jnp.zeros((1, 224, 224, 3)),)

        def loss_fn(variables, batch, train):
            if train:
                loss, updates = net.apply(
                    variables, batch["image"], batch["feature"], True,
                    method="loss", mutable=["batch_stats"])
                return loss, {"batch_stats": updates["batch_stats"]}
            loss = net.apply(variables, batch["image"], batch["feature"],
                             False, method="loss")
            return loss, {}
        return net, init_args, loss_fn, ("image", "feature")

    raise ValueError(f"unknown train_method {tm!r}")


def load_training_arrays(cfg: TrainConfig, split: str) -> Dict[str, np.ndarray]:
    """FeatureStore dumps -> batch columns for the selected train method.

    Column mapping mirrors the reference's three dataset classes
    (dataset.py:247-361) over the npz layouts in data.feature_store.
    """
    tm = cfg.train_method
    store = FeatureStore(cfg.data_path)
    if tm in ("HallucinationCrossModality", "HallucinationCrossModalityConv"):
        cols = store.load_stacked(split, ["patch"])
        return {"patch": cols["patch"].astype(np.float32)}
    if tm in ("RGBFeatureToXYZInputMLP", "RGBFeatureToXYZInputConv"):
        cols = store.load_stacked(split, ["frgb", "xyz"])     # frgb -> pc image
        return {"feature": cols["frgb"].astype(np.float32),
                "target": _to_channels_last(cols["xyz"]).astype(np.float32)}
    if tm in ("XYZFeatureToRGBInputMLP", "XYZFeatureToRGBInputConv"):
        cols = store.load_stacked(split, ["hfxyz", "rgb"])    # fxyz -> rgb image
        return {"feature": cols["hfxyz"].astype(np.float32),
                "target": _to_channels_last(cols["rgb"]).astype(np.float32)}
    if tm == "RGBInputToXYZFeatureHRNET":
        cols = store.load_stacked(split, ["rgb", "hfxyz"])
        return {"image": _to_channels_last(cols["rgb"]).astype(np.float32),
                "feature": cols["hfxyz"].astype(np.float32)}
    if tm == "XYZInputToRGBFeatureHRNET":
        cols = store.load_stacked(split, ["xyz", "frgb"])
        return {"image": _to_channels_last(cols["xyz"]).astype(np.float32),
                "feature": cols["frgb"].astype(np.float32)}
    raise ValueError(tm)


# ---------------------------------------------------------------------------
# trainer
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class TrainResult:
    params: Any
    batch_stats: Any
    history: Dict[str, list]


class DistillTrainer:
    def __init__(self, cfg: TrainConfig, feature_dim: int = 768,
                 arrays: Optional[Dict[str, np.ndarray]] = None,
                 test_arrays: Optional[Dict[str, np.ndarray]] = None):
        self.cfg = cfg
        if cfg.mesh_shape:
            self.mesh = make_mesh(cfg.mesh_shape)
        else:
            # default: widest data-parallel axis that divides the batch
            n_dev = len(jax.devices())
            d = min(n_dev, cfg.batch_size)
            while cfg.batch_size % d:
                d -= 1
            self.mesh = make_mesh((d,))
        self.net, init_args, self.loss_fn, self.keys = build_train_setup(
            cfg, feature_dim)

        self.arrays = arrays if arrays is not None else load_training_arrays(cfg, "train")
        self.test_arrays = (test_arrays if test_arrays is not None
                            else load_training_arrays(cfg, "test"))
        self.n_train = len(next(iter(self.arrays.values())))

        eff_batch = cfg.batch_size * cfg.accum_iter
        self.lr = cfg.lr if cfg.lr is not None else cfg.blr * eff_batch / 256.0
        # optax.MultiSteps advances the inner schedule once per *accumulated*
        # update, so epochs must be counted in updates, not micro-batches —
        # otherwise warmup stretches accum_iter x too long
        updates_per_epoch = max((self.n_train // cfg.batch_size)
                                // max(cfg.accum_iter, 1), 1)
        schedule = warmup_constant_lr(self.lr, cfg.warmup_epochs,
                                      updates_per_epoch)
        # note: the reference parses --weight_decay but never passes it to
        # torch.optim.Adam (pretrain:261) — decay is opt-in here and off by
        # default for behaviour parity
        tx = optax.adam(schedule)
        if cfg.weight_decay:
            tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay), tx)
        if cfg.accum_iter > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=cfg.accum_iter)
        self.tx = tx

        variables = self.net.init(jax.random.PRNGKey(cfg.seed), *init_args)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.opt_state = tx.init(self.params)
        self.start_epoch = cfg.start_epoch
        resume = cfg.resume
        if resume == "auto":
            # elastic restart: pick up the newest checkpoint if one exists
            resume = self._latest_checkpoint()
            if resume is None:
                log.info("resume=auto: no checkpoint found, fresh start")
        if resume:
            self._resume(resume)

        # replicate state over the mesh; batches get sharded per step
        self.params = replicate(self.mesh, self.params)
        self.batch_stats = replicate(self.mesh, self.batch_stats)
        self.opt_state = replicate(self.mesh, self.opt_state)
        self._step = self._build_step()
        self._eval = self._build_eval()

    # ------------------------------------------------------------------
    def _variables(self, params, batch_stats):
        v = {"params": params}
        if batch_stats:
            v["batch_stats"] = batch_stats
        return v

    def _build_step(self):
        loss_fn, tx = self.loss_fn, self.tx

        def step(params, batch_stats, opt_state, batch):
            def lf(p):
                loss, aux = loss_fn(self._variables(p, batch_stats), batch,
                                    True)
                return loss, aux
            (loss, aux), grads = jax.value_and_grad(lf, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            new_stats = aux.pop("batch_stats", batch_stats)
            return params, new_stats, opt_state, loss, aux
        return jax.jit(step, donate_argnums=(0, 1, 2))

    def _build_eval(self):
        loss_fn = self.loss_fn

        def ev(params, batch_stats, batch):
            loss, aux = loss_fn(self._variables(params, batch_stats), batch,
                                False)
            return loss, aux
        return jax.jit(ev)

    def _batches(self, arrays, rng, batch_size, drop_last=True):
        n = len(next(iter(arrays.values())))
        order = rng.permutation(n) if rng is not None else np.arange(n)
        stop = (n // batch_size) * batch_size if drop_last else n
        for i in range(0, stop, batch_size):
            idx = order[i:i + batch_size]
            if len(idx) < batch_size:  # eval tail: pad with repeats so the
                idx = np.concatenate(   # batch stays mesh-divisible
                    [idx, np.repeat(idx[-1:], batch_size - len(idx))])
            batch = {k: v[idx] for k, v in arrays.items()}
            yield shard_batch(self.mesh, batch)

    # ------------------------------------------------------------------
    def _resume(self, path: str):
        meta = load_meta(path)
        self.params = restore_into(self.params, load_flat(path, "params"))
        if self.batch_stats:
            self.batch_stats = restore_into(
                self.batch_stats, load_flat(path, "batch_stats"))
        opt_flat = load_flat(path, "opt_state")
        if opt_flat:
            self.opt_state = restore_into(self.opt_state, opt_flat)
        self.start_epoch = int(meta.get("epoch", -1)) + 1
        log.info("resumed from %s at epoch %d", path, self.start_epoch)

    def _latest_checkpoint(self):
        import glob
        import re
        if not self.cfg.output_dir:
            return None
        paths = glob.glob(f"{self.cfg.output_dir}/checkpoint-*.npz")
        if not paths:
            return None
        def epoch_of(p):
            m = re.search(r"checkpoint-(\d+)\.npz$", p)
            return int(m.group(1)) if m else -1
        return max(paths, key=epoch_of)

    def _log_metrics(self, record: dict):
        """Append scalars to <output_dir>/metrics.jsonl (the framework's
        TensorBoard-scalar replacement; plot with any tool)."""
        if not self.cfg.output_dir:
            return
        import json
        import os
        os.makedirs(self.cfg.output_dir, exist_ok=True)
        with open(f"{self.cfg.output_dir}/metrics.jsonl", "a") as f:
            f.write(json.dumps(record) + "\n")

    def _save(self, epoch: int):
        if not self.cfg.output_dir:
            return
        path = f"{self.cfg.output_dir}/checkpoint-{epoch}.npz"
        save_pytree(path, {"params": jax.device_get(self.params),
                           "batch_stats": jax.device_get(self.batch_stats),
                           "opt_state": jax.device_get(self.opt_state)},
                    meta={"epoch": epoch,
                          "train_method": self.cfg.train_method})
        log.info("saved %s", path)

    # ------------------------------------------------------------------
    def train(self) -> TrainResult:
        cfg = self.cfg
        history = {"train_loss": [], "test_loss": []}
        rng = np.random.default_rng(cfg.seed)
        with self.mesh:
            for epoch in range(self.start_epoch, cfg.epochs):
                t0 = time.perf_counter()
                losses = []
                aux_acc: Dict[str, list] = {}
                for batch in self._batches(self.arrays, rng, cfg.batch_size):
                    (self.params, self.batch_stats, self.opt_state, loss,
                     aux) = self._step(self.params, self.batch_stats,
                                       self.opt_state, batch)
                    losses.append(loss)
                    for k, v in aux.items():  # per-direction loss components
                        aux_acc.setdefault(k, []).append(v)
                train_loss = float(jnp.mean(jnp.stack(losses)))
                if not math.isfinite(train_loss):
                    raise FloatingPointError(
                        f"loss is {train_loss}, stopping training "
                        f"(reference aborts identically, pretrain:144-146)")
                history["train_loss"].append(train_loss)

                test_losses = []
                test_aux_acc: Dict[str, list] = {}
                for batch in self._batches(self.test_arrays, None,
                                           cfg.batch_size, drop_last=False):
                    loss, aux = self._eval(self.params, self.batch_stats, batch)
                    test_losses.append(float(loss))
                    for k, v in aux.items():
                        if k != "batch_stats":
                            test_aux_acc.setdefault(k, []).append(float(v))
                test_loss = float(np.mean(test_losses)) if test_losses else float("nan")
                history["test_loss"].append(test_loss)
                log.info("epoch %d: train %.4f test %.4f (%.1fs)", epoch,
                         train_loss, test_loss, time.perf_counter() - t0)
                # per-direction components (loss_xyz / loss_rgb) logged
                # separately, matching the reference's per-loss TensorBoard
                # scalars (hallucination_network_pretrain.py:124-142,310-316)
                record = {"epoch": epoch, "train_loss": train_loss,
                          "test_loss": test_loss,
                          "epoch_s": time.perf_counter() - t0}
                for k, vals in aux_acc.items():
                    record[f"train_{k}"] = float(jnp.mean(jnp.stack(vals)))
                for k, vals in test_aux_acc.items():
                    record[f"test_{k}"] = float(np.mean(vals))
                self._log_metrics(record)

                if (epoch + 1) % cfg.save_every == 0:
                    self._save(epoch)
        return TrainResult(jax.device_get(self.params),
                           jax.device_get(self.batch_stats), history)
