# -*- coding: utf-8 -*-
# TrafficLight LFD_S training entry point (reference
# `TrafficLight_train/TL_LFD_S.py`): QualityFocalLoss(w=2) + IoULoss,
# 'dist' range mode, crop 640, COCO-format data via pack_TL.
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

# Honor JAX_PLATFORMS even on hosts whose sitecustomize pre-registers a
# TPU plugin and pins jax.config to it (setting the env var alone is then
# silently ignored, and a CPU-only run blocks on TPU client init).
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from lfdtpu import zoo
from lfdtpu.data import (
    DataLoader,
    Dataset,
    RandomBBoxCropRegionSampler,
    RandomWithNegDatasetSampler,
)
from lfdtpu.execution import (
    Executor,
    MultiStepLRSchedule,
    SGD,
    WarmupSetting,
    customize_exception_hook,
    set_random_seed,
)
from TL_augmentation_pipeline import tl_train_pipeline

config_dict = dict()


def prepare_common_settings():
    config_dict["timestamp"] = time.strftime("%Y%m%d_%H%M%S", time.localtime())
    base = os.path.basename(__file__).split(".")[0]
    config_dict["work_dir"] = "./" + base + "_work_dir_" + config_dict["timestamp"]
    os.makedirs(config_dict["work_dir"], exist_ok=True)
    shutil.copyfile(__file__, os.path.join(config_dict["work_dir"], os.path.basename(__file__)))
    config_dict["log_path"] = os.path.join(
        config_dict["work_dir"], "log_" + config_dict["timestamp"] + ".log"
    )
    sys.excepthook = customize_exception_hook(
        os.path.join(config_dict["work_dir"], "exception_log_" + config_dict["timestamp"] + ".log")
    )
    config_dict["training_epochs"] = int(os.environ.get("LFD_EPOCHS", 500))
    config_dict["seed"] = 666
    set_random_seed(config_dict["seed"])
    config_dict["display_interval"] = 100
    config_dict["save_interval"] = 50
    config_dict["val_interval"] = 0


def prepare_model():
    config_dict["num_classes"] = 1
    config_dict["detection_scales"] = zoo.TL_SCALES
    config_dict["model"] = zoo.trafficlight_lfd("S")
    config_dict["weight_path"] = None
    config_dict["resume_path"] = None
    config_dict["evaluator"] = None


def prepare_data_pipeline():
    # LFD_* env overrides mirror the other workloads: they let CI and the
    # TPU verify drive run this real entry point on a tiny pack.
    config_dict["batch_size"] = int(os.environ.get("LFD_BATCH_SIZE", 4))
    config_dict["num_train_workers"] = int(os.environ.get("LFD_NUM_WORKERS", 4))
    config_dict["train_dataset_path"] = os.environ.get(
        "LFD_DATASET_PATH", "./TL_pack/tl_train.pkl")
    crop = int(os.environ.get("LFD_CROP_SIZE", 640))
    config_dict["input_hw"] = (crop, crop)
    train_dataset = Dataset(load_path=config_dict["train_dataset_path"])
    sampler = RandomWithNegDatasetSampler(
        train_dataset, batch_size=config_dict["batch_size"], neg_ratio=0.2,
        shuffle=True, ignore_last=False,
    )
    region = RandomBBoxCropRegionSampler(crop_size=crop, resize_range=(0.5, 1.5), resize_prob=0.5)
    # LFD_DEVICE_AUG=1: resample+flip+BGR2RGB+imagenet-normalize move into
    # the jitted train step (data/device_aug.py). Flip stays 0.5 (the TL
    # pipeline flips, `TL_augmentation_pipeline.py:12`); the channel swap
    # and standard_normalize fold into make_device_preprocess(bgr2rgb).
    if int(os.environ.get("LFD_DEVICE_AUG", 0)):
        import numpy as _np

        from lfdtpu.data import DeviceAugRegionSampler, make_device_augment
        from lfdtpu.deploy import make_device_preprocess

        config_dict["device_augment"] = make_device_augment(
            crop,
            normalize=make_device_preprocess(
                (0.485, 0.456, 0.406), (0.229, 0.224, 0.225), bgr2rgb=True
            ),
        )
        config_dict["train_data_loader"] = DataLoader(
            dataset=train_dataset, dataset_sampler=sampler,
            region_sampler=DeviceAugRegionSampler(region, flip_p=0.5),
            augmentation_pipeline=None,
            num_workers=config_dict["num_train_workers"],
            max_boxes_per_image=100,
            image_dtype=_np.uint8,
        )
        return
    config_dict["train_data_loader"] = DataLoader(
        dataset=train_dataset, dataset_sampler=sampler, region_sampler=region,
        augmentation_pipeline=tl_train_pipeline,
        num_workers=config_dict["num_train_workers"],
        max_boxes_per_image=100,
    )


def prepare_optimizer():
    config_dict["learning_rate"] = 0.1
    config_dict["optimizer"] = SGD(momentum=0.9, weight_decay=0.0001)
    config_dict["optimizer_grad_clip_cfg"] = dict(max_norm=10, duration=5)
    config_dict["milestones"] = [200, 300, 400]
    config_dict["lr_schedule"] = MultiStepLRSchedule(
        base_lr=0.1, milestones=(200, 300, 400), gamma=0.1,
        warmup=WarmupSetting(by_epoch=False, warmup_mode="linear",
                             warmup_loops=200, warmup_ratio=0.1),
    )


if __name__ == "__main__":
    prepare_common_settings()
    prepare_model()
    prepare_data_pipeline()
    prepare_optimizer()
    Executor(config_dict).run()
