# Executor (reference `lfd/execution/executor.py:13-259`): owns the
# config_dict, the hook registry, the train/val loops, checkpoint/resume.
#
# TPU re-design:
#   - the device step is ONE jitted program (forward + on-device target
#     assignment + loss + grad + clip + optimizer) built by
#     lfdtpu.parallel.make_train_step over a `data` mesh — the reference's
#     DataParallel wrap + OptimizerHook backward/step collapse into it.
#   - lr and the clip-window flag are host-computed scalars fed into the
#     step each iteration (no recompiles across the schedule).
#   - checkpoints carry params/batch_stats/opt_state + counters + basic
#     config meta (`executor.py:101-113`); resume restores all of them.
#
# config_dict keys consumed (mirroring the reference):
#   model (LFD-family wrapper), optimizer (execution.optim), lr_schedule,
#   optimizer_grad_clip_cfg {max_norm, duration}?, train_data_loader,
#   val_data_loader?, evaluator?, training_epochs, work_dir, log_path?,
#   display_interval, save_interval, val_interval, seed?, batch_size,
#   weight_path?, resume_path?, mesh?, input_hw?, extra_hooks?

from __future__ import annotations

import os
import time

import jax
import numpy as np

from .hooks import (
    CheckpointHook,
    EvaluationHook,
    Hook,
    LoggerHook,
    LrSchedulerHook,
    OptimizerHook,
    SpeedHook,
    get_priority,
)
from .utils import AverageMeter, get_root_logger, load_checkpoint, save_checkpoint, set_random_seed

_BASIC_TYPES = (str, int, float, bool, list, tuple, dict, set, type(None))


class Executor:
    def __init__(self, config_dict):
        # imported here: lfdtpu.parallel <-> lfdtpu.execution would otherwise
        # form an import cycle through the package __init__s
        from ..parallel.data_parallel import make_train_step
        from ..parallel.mesh import make_mesh

        self.config_dict = config_dict
        cfg = self.config_dict

        cfg.setdefault("work_dir", "./work_dir")
        os.makedirs(cfg["work_dir"], exist_ok=True)
        cfg["logger"] = get_root_logger(cfg.get("log_path"))

        cfg.setdefault("display_interval", 100)
        cfg.setdefault("save_interval", 1)
        cfg.setdefault("val_interval", 0)
        cfg.setdefault("mode", "train")
        cfg["epoch"] = 0
        cfg["train_iter"] = 0
        cfg["inner_train_iter"] = 0
        cfg["inner_val_iter"] = 0
        cfg["train_average_meter"] = AverageMeter()
        cfg["val_average_meter"] = AverageMeter()
        if "batch_size" not in cfg and "train_data_loader" in cfg:
            cfg["batch_size"] = cfg["train_data_loader"].batch_size

        self.detector = cfg["model"]
        self.optimizer = cfg["optimizer"]
        self.mesh = cfg.get("mesh")
        if self.mesh is None:
            # largest device count that divides the batch (batches shard on
            # dim 0; the reference likewise requires batch >= len(gpu_list))
            devices = jax.devices()
            bs = int(cfg.get("batch_size", 1))
            n = len(devices)
            while n > 1 and bs % n != 0:
                n -= 1
            self.mesh = make_mesh(devices[:n])

        rng = set_random_seed(cfg.get("seed", 0))
        input_hw = cfg.get("input_hw")
        if input_hw is None:
            raise ValueError("config_dict['input_hw'] (train crop size) is required")
        self.input_hw = (int(input_hw[0]), int(input_hw[1]))

        from ..parallel.data_parallel import create_train_state

        self.state = create_train_state(
            self.detector, self.optimizer, rng, self.input_hw,
            batch_size=max(cfg.get("batch_size", 1) // max(self.mesh.size, 1), 1),
        )

        # weight init / resume (`executor.py:32-36,134-176`)
        if cfg.get("resume_path"):
            self.resume(cfg["resume_path"])
        elif cfg.get("weight_path"):
            state_np, _ = load_checkpoint(cfg["weight_path"], strict=False, logger=cfg["logger"])
            self.state = self.state.replace(
                params=jax.tree.map(lambda t, s: np.asarray(s).astype(t.dtype), self.state.params, state_np["params"]),
                batch_stats=state_np.get("batch_stats", self.state.batch_stats),
            )

        clip_cfg = cfg.get("optimizer_grad_clip_cfg")
        # cfg['device_preprocess']: normalize on device so the loader can
        # ship raw uint8 batches (deploy.make_device_preprocess).
        # cfg['device_augment']: FULL device-side augmentation (resample +
        # flip + normalize, data.device_aug.make_device_augment) — the
        # loader then ships raw uint8 source windows + per-image aug params
        # from a DeviceAugRegionSampler and the step's `images` argument
        # becomes the {buffer, scale, translation, flip} pytree.
        self._aug_on_device = cfg.get("device_augment") is not None
        self._train_step = make_train_step(
            self.detector,
            self.optimizer,
            self.input_hw,
            mesh=self.mesh,
            clip_max_norm=float(clip_cfg["max_norm"]) if clip_cfg else 0.0,
            preprocess=cfg.get("device_augment") or cfg.get("device_preprocess"),
        )
        self._eval_step = None

        self._pending_metrics = []
        self._hooks = []
        self._register_default_hooks()
        for h in cfg.get("extra_hooks", []):
            self.register_hook(h)

    # ------------------------------------------------------------- hooks
    def register_hook(self, hook, priority=None):
        assert isinstance(hook, Hook)
        if priority is not None:
            hook.priority = priority
        p = get_priority(hook.priority)
        for i, h in enumerate(self._hooks):
            if p < get_priority(h.priority):
                self._hooks.insert(i, hook)
                break
        else:
            self._hooks.append(hook)

    def _register_default_hooks(self):
        cfg = self.config_dict
        self.register_hook(LrSchedulerHook())
        self.register_hook(
            OptimizerHook(cfg.get("optimizer_grad_clip_cfg"), cfg["training_epochs"])
        )
        self.register_hook(SpeedHook())
        self.register_hook(CheckpointHook())
        if cfg.get("evaluator") is not None:
            self.register_hook(EvaluationHook())
        self.register_hook(LoggerHook())

    def call_hooks(self, fn_name):
        for hook in self._hooks:
            getattr(hook, fn_name)(self)

    def get_current_lr(self):
        return self.config_dict.get("current_lr", 0.0)

    # ------------------------------------------------------ train / val
    def train(self):
        cfg = self.config_dict
        cfg["mode"] = "train"
        self.call_hooks("before_train_epoch")
        from ..parallel.mesh import prefetch_to_device

        keys = ("images", "gt_bboxes", "gt_labels", "gt_mask")
        if self._aug_on_device:
            from ..data.device_aug import AUG_KEYS

            keys = keys + AUG_KEYS
        batches = prefetch_to_device(
            cfg["train_data_loader"], self.mesh,
            size=int(cfg.get("device_prefetch", 2)), keys=keys,
        )
        for inner, batch in enumerate(batches):
            cfg["inner_train_iter"] = inner
            self.call_hooks("before_train_iter")
            if self._aug_on_device:
                images = dict(
                    buffer=batch["images"], scale=batch["aug_scale"],
                    translation=batch["aug_translation"],
                    flip=batch["aug_flip"],
                )
            else:
                images = batch["images"]
            self.state, metrics = self._train_step(
                self.state,
                images, batch["gt_bboxes"],
                batch["gt_labels"], batch["gt_mask"],
                np.float32(cfg["current_lr"]),
                np.bool_(cfg.get("clip_enabled", False)),
            )
            # async metering: keep device scalars and convert only at
            # display time, so steps pipeline without a host sync each iter
            # (the reference syncs every iter via loss.item())
            self._pending_metrics.append((metrics, cfg["batch_size"]))
            display = cfg["display_interval"]
            if (inner + 1) % display == 0 or (inner + 1) == len(cfg["train_data_loader"]):
                self._flush_metrics()
            self.call_hooks("after_train_iter")
            cfg["train_iter"] += 1
        self._flush_metrics()
        self.call_hooks("after_train_epoch")

    def _flush_metrics(self):
        cfg = self.config_dict
        for metrics, bs in self._pending_metrics:
            for name, val in metrics.items():
                if "loss" in name:
                    cfg["train_average_meter"].update(name, float(val), bs)
            cfg["grad_norm"] = float(metrics["grad_norm"])
        self._pending_metrics.clear()

    def val(self):
        cfg = self.config_dict
        if cfg.get("val_data_loader") is None:
            return
        cfg["mode"] = "val"
        if self._eval_step is None:
            from ..parallel.data_parallel import make_eval_step

            self._eval_step = make_eval_step(self.detector, self.mesh)
        self.call_hooks("before_val_epoch")
        for inner, batch in enumerate(cfg["val_data_loader"]):
            cfg["inner_val_iter"] = inner
            self.call_hooks("before_val_iter")
            from ..parallel.mesh import shard_batch

            images = shard_batch(self.mesh, batch["images"])
            outs = self._eval_step(self.state, images)
            input_hw = (batch["images"].shape[1], batch["images"].shape[2])
            cfg["eval_results"] = self.detector.results_from_outputs(
                outs, input_hw, batch["meta"]
            )
            cfg["eval_meta"] = batch["meta"]
            self.call_hooks("after_val_iter")
        self.call_hooks("after_val_epoch")
        cfg["mode"] = "train"

    def run(self):
        """Epochs of train + periodic val (`executor.py:249-259`)."""
        cfg = self.config_dict
        self.call_hooks("before_run")
        while cfg["epoch"] < cfg["training_epochs"]:
            self.train()
            if (
                cfg.get("val_interval", 0) > 0
                and (cfg["epoch"] + 1) % cfg["val_interval"] == 0
            ):
                self.val()
            cfg["epoch"] += 1
        self.call_hooks("after_run")

    # ------------------------------------------------------- checkpoint
    def _meta(self):
        return {
            k: v
            for k, v in self.config_dict.items()
            if isinstance(v, _BASIC_TYPES)
            and k not in ("train_average_meter", "val_average_meter")
        }

    def save(self, path=None):
        cfg = self.config_dict
        path = path or os.path.join(cfg["work_dir"], f"epoch_{cfg['epoch'] + 1}.ckpt")
        meta = self._meta()
        meta["epoch"] = cfg["epoch"]
        meta["train_iter"] = cfg["train_iter"]
        save_checkpoint(
            path,
            {
                "params": self.state.params,
                "batch_stats": self.state.batch_stats,
                "opt_state": self.state.opt_state,
            },
            meta=meta,
        )
        cfg["logger"].info(f"checkpoint saved to {path}")

    def resume(self, path):
        cfg = self.config_dict
        from ..parallel.data_parallel import TrainState

        state_np, meta = load_checkpoint(path, strict=True)
        cast = lambda t, s: np.asarray(s).astype(np.asarray(t).dtype)
        self.state = TrainState(
            params=jax.tree.map(cast, self.state.params, state_np["params"]),
            batch_stats=jax.tree.map(cast, self.state.batch_stats, state_np["batch_stats"]),
            opt_state=jax.tree.map(cast, self.state.opt_state, state_np["opt_state"]),
        )
        cfg["epoch"] = meta.get("epoch", 0) + 1
        cfg["train_iter"] = meta.get("train_iter", 0)
        cfg["logger"].info(f"resumed from {path} at epoch {cfg['epoch']}")

    @property
    def variables(self):
        return {"params": self.state.params, "batch_stats": self.state.batch_stats}
