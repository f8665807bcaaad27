# Executor / schedule / optimizer tests (reference semantics:
# lr_scheduler_hook.py warmup + MultiStepLR, optimizer_hook.py clip window,
# executor.py run loop + checkpoint/resume).
import os

import numpy as np
import pytest

from lfdtpu.execution.schedules import MultiStepLRSchedule, WarmupSetting
from lfdtpu.execution.optim import SGD
import jax
import jax.numpy as jnp


def test_multistep_warmup_linear():
    # WIDERFACE_LFD_S settings: lr 0.1, milestones [500,700,900], gamma 0.1,
    # linear warmup 200 iters ratio 0.1 (`WIDERFACE_LFD_S.py:217-243`)
    sched = MultiStepLRSchedule(
        base_lr=0.1, milestones=(500, 700, 900), gamma=0.1,
        warmup=WarmupSetting(by_epoch=False, warmup_mode="linear",
                             warmup_loops=200, warmup_ratio=0.1),
    )
    # iter 0 -> loop 1: lr = base * (1 - (1 - 1/200) * 0.9)
    np.testing.assert_allclose(sched(0, 0), 0.1 * (1 - (1 - 1 / 200) * 0.9))
    # end of warmup
    np.testing.assert_allclose(sched(0, 199), 0.1)
    # past warmup, before milestones
    np.testing.assert_allclose(sched(10, 5000), 0.1)
    # after milestones
    np.testing.assert_allclose(sched(500, 10**6), 0.01)
    np.testing.assert_allclose(sched(700, 10**6), 0.001)
    np.testing.assert_allclose(sched(950, 10**6), 1e-4)


def test_warmup_constant_and_exp():
    for mode, expect in [("constant", 0.1 * 0.1), ("exp", 0.1 * 0.1 ** (1 - 1 / 10))]:
        sched = MultiStepLRSchedule(
            base_lr=0.1,
            warmup=WarmupSetting(warmup_mode=mode, warmup_loops=10, warmup_ratio=0.1),
        )
        np.testing.assert_allclose(sched(0, 0), expect, rtol=1e-6)


def test_sgd_matches_torch_semantics():
    # one torch-SGD step: g' = g + wd*p; buf = m*buf + g'; p -= lr*buf
    import torch

    p0 = np.array([1.0, -2.0, 3.0], np.float32)
    g0 = np.array([0.1, 0.2, -0.3], np.float32)
    tp = torch.tensor(p0, requires_grad=True)
    opt = torch.optim.SGD([tp], lr=0.1, momentum=0.9, weight_decay=0.01)
    for g in [g0, g0 * 0.5]:
        opt.zero_grad()
        tp.grad = torch.tensor(g)
        opt.step()

    sgd = SGD(momentum=0.9, weight_decay=0.01)
    params = {"w": jnp.asarray(p0)}
    state = sgd.init(params)
    for g in [g0, g0 * 0.5]:
        updates, state = sgd.update({"w": jnp.asarray(g)}, state, params, 0.1)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]), tp.detach().numpy(), rtol=1e-6)


class _ArrayDataset:
    """Tiny in-memory dataset for executor smoke tests."""

    def __init__(self, n=8):
        rng = np.random.RandomState(0)
        self._samples = {}
        for i in range(n):
            img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
            s = {"image": img}
            if i % 4 != 3:  # 1/4 neg samples
                s["bboxes"] = [[10, 10, 20, 20]]
                s["bbox_labels"] = [0]
            self._samples[i] = s

    def __getitem__(self, i):
        return self._samples[i]

    def __len__(self):
        return len(self._samples)

    def get_indexes(self):
        return list(self._samples.keys())


@pytest.mark.slow
def test_executor_end_to_end(tmp_path):
    from lfdtpu.data import (
        DataLoader, RandomWithNegDatasetSampler, RandomBBoxCropRegionSampler,
        simple_widerface_train_pipeline,
    )
    from lfdtpu.execution import Executor, SGD, MultiStepLRSchedule, WarmupSetting
    from lfdtpu.models import LFD, LFDResNet, SimpleNeck, LFDHead
    from lfdtpu.ops.loss_wrappers import FocalLoss, IoULoss

    dataset = _ArrayDataset(8)
    sampler = RandomWithNegDatasetSampler(dataset, batch_size=4, neg_ratio=0.25, seed=0)
    region = RandomBBoxCropRegionSampler(crop_size=64, resize_range=(0.8, 1.2))
    loader = DataLoader(dataset, sampler, region,
                        augmentation_pipeline=simple_widerface_train_pipeline,
                        num_workers=2, max_boxes_per_image=8)

    bb = LFDResNet(block_mode="fastest", stem_mode="fastest", body_mode=None,
                   stem_channels=16, body_architecture=(1, 1), body_channels=(16, 32),
                   out_indices=((0, 0), (1, 0)), norm_cfg=dict(type="BatchNorm2d"))
    neck = SimpleNeck(num_neck_channels=32,
                      num_input_strides_list=tuple(bb.num_output_strides_list),
                      norm_cfg=dict(type="BatchNorm2d"))
    cls_loss, reg_loss = FocalLoss(), IoULoss()
    head = LFDHead(num_classes=1, num_heads=2, num_head_channels=32, num_conv_layers=1,
                   norm_cfg=None, share_head_flag=True, merge_path_flag=True,
                   classification_loss_type="FocalLoss", regression_loss_type="IoULoss")
    det = LFD(backbone=bb, neck=neck, head=head, num_classes=1,
              regression_ranges=((0, 32), (32, 64)),
              point_strides=tuple(bb.num_output_strides_list),
              classification_loss_func=cls_loss, regression_loss_func=reg_loss,
              distance_to_bbox_mode="sigmoid")

    config = dict(
        work_dir=str(tmp_path / "work"),
        training_epochs=2,
        display_interval=1,
        save_interval=1,
        seed=1,
        batch_size=4,
        input_hw=(64, 64),
        model=det,
        optimizer=SGD(momentum=0.9, weight_decay=1e-4),
        lr_schedule=MultiStepLRSchedule(
            base_lr=0.01, milestones=(1,), gamma=0.1,
            warmup=WarmupSetting(warmup_mode="linear", warmup_loops=2, warmup_ratio=0.1),
        ),
        optimizer_grad_clip_cfg=dict(max_norm=10, duration=1),
        train_data_loader=loader,
    )
    ex = Executor(config)
    ex.run()

    # checkpoints written each epoch
    ckpts = sorted(os.listdir(config["work_dir"]))
    assert any(c.startswith("epoch_") for c in ckpts), ckpts

    # resume restores counters + params
    ckpt_path = os.path.join(config["work_dir"], "epoch_2.ckpt")
    assert os.path.exists(ckpt_path)
    config2 = dict(config)
    config2["resume_path"] = ckpt_path
    config2["training_epochs"] = 2
    ex2 = Executor(config2)
    assert ex2.config_dict["epoch"] == 2
    w1 = jax.tree.leaves(ex.state.params)[0]
    w2 = jax.tree.leaves(ex2.state.params)[0]
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2))


@pytest.mark.slow
def test_executor_val_loop(tmp_path):
    import json

    from lfdtpu.data import DataLoader, IdleRegionSampler, RandomDatasetSampler, Compose, simple_normalize
    from lfdtpu.evaluation import COCOEvaluator
    from lfdtpu.execution import Executor, SGD, ConstantLRSchedule
    from tests.test_detector import tiny_lfd

    # in-memory dataset with image_id meta so COCOEvaluator can match
    rng2 = np.random.RandomState(1)

    class _ValDataset(_ArrayDataset):
        def __init__(self):
            super().__init__(4)
            for i, s in self._samples.items():
                s["image_id"] = i + 1
                s["image"] = (rng2.rand(64, 64, 3) * 255).astype(np.uint8)
                s["bboxes"] = [[8, 8, 16, 16]]
                s["bbox_labels"] = [0]

    ds = _ValDataset()
    ann = {
        "images": [{"id": i + 1, "height": 64, "width": 64, "file_name": f"{i}.jpg"} for i in range(4)],
        "annotations": [
            {"id": i + 1, "image_id": i + 1, "category_id": 1,
             "bbox": [8, 8, 16, 16], "iscrowd": 0, "area": 256}
            for i in range(4)
        ],
        "categories": [{"id": 1, "name": "obj"}],
    }
    ann_path = str(tmp_path / "val.json")
    with open(ann_path, "w") as f:
        json.dump(ann, f)

    det = tiny_lfd()
    train_loader = DataLoader(
        ds, RandomDatasetSampler(ds, batch_size=4, seed=0), IdleRegionSampler(),
        augmentation_pipeline=Compose([simple_normalize]), num_workers=1,
        max_boxes_per_image=4,
    )
    val_loader = DataLoader(
        ds, RandomDatasetSampler(ds, batch_size=4, shuffle=False, seed=0),
        IdleRegionSampler(), augmentation_pipeline=Compose([simple_normalize]),
        num_workers=1, max_boxes_per_image=4,
    )
    config = dict(
        work_dir=str(tmp_path / "w"), training_epochs=1, display_interval=10,
        save_interval=100, val_interval=1, seed=0, batch_size=4,
        input_hw=(64, 64), model=det, optimizer=SGD(momentum=0.9),
        lr_schedule=ConstantLRSchedule(base_lr=0.01),
        train_data_loader=train_loader, val_data_loader=val_loader,
        evaluator=COCOEvaluator(ann_path, {0: 1}),
    )
    ex = Executor(config)
    ex.run()
    # evaluator produced a display string (mAP may be ~0 untrained)
    assert "mAP" in config["evaluator"].get_eval_display_str()


def test_load_backbone_weights(tmp_path):
    from lfdtpu.execution.utils import load_backbone_weights, save_checkpoint
    from tests.test_detector import tiny_lfd

    det = tiny_lfd()
    v1 = det.init(jax.random.PRNGKey(1), (64, 64))
    # checkpoint of the FULL model; backbone subtree lives under 'backbone'
    save_checkpoint(str(tmp_path / "full.ckpt"), {"params": v1["params"]})

    det2 = tiny_lfd()
    v2 = det2.init(jax.random.PRNGKey(2), (64, 64))
    loaded = load_backbone_weights(
        v2["params"]["backbone"], str(tmp_path / "full.ckpt"), prefix="backbone"
    )
    a = jax.tree.leaves(loaded)[0]
    b = jax.tree.leaves(v1["params"]["backbone"])[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_executor_device_augment(tmp_path):
    """cfg['device_augment'] switches the Executor's train loop to the
    device-aug contract: the loader (DeviceAugRegionSampler) ships raw
    uint8 source windows + per-image resample params, and the train step
    resamples/flips/normalizes on device (data/device_aug.py)."""
    from lfdtpu.data import (
        DataLoader, DeviceAugRegionSampler, RandomBBoxCropRegionSampler,
        RandomWithNegDatasetSampler, make_device_augment,
    )
    from lfdtpu.deploy import make_device_preprocess
    from lfdtpu.execution import Executor, SGD, ConstantLRSchedule
    from lfdtpu.models import LFD, LFDResNet, SimpleNeck, LFDHead
    from lfdtpu.ops.loss_wrappers import FocalLoss, IoULoss

    dataset = _ArrayDataset(8)
    sampler = RandomWithNegDatasetSampler(dataset, batch_size=4,
                                          neg_ratio=0.25, seed=0)
    region = DeviceAugRegionSampler(
        RandomBBoxCropRegionSampler(crop_size=64, resize_range=(0.8, 1.2)),
        flip_p=0.5,
    )
    loader = DataLoader(dataset, sampler, region, augmentation_pipeline=None,
                        num_workers=2, max_boxes_per_image=8,
                        image_dtype=np.uint8)

    bb = LFDResNet(block_mode="fastest", stem_mode="fastest", body_mode=None,
                   stem_channels=16, body_architecture=(1,), body_channels=(16,),
                   out_indices=((0, 0),), norm_cfg=dict(type="BatchNorm2d"))
    neck = SimpleNeck(num_neck_channels=16,
                      num_input_strides_list=tuple(bb.num_output_strides_list),
                      norm_cfg=dict(type="BatchNorm2d"))
    head = LFDHead(num_classes=1, num_heads=1, num_head_channels=16,
                   num_conv_layers=1, norm_cfg=None,
                   classification_loss_type="FocalLoss",
                   regression_loss_type="IoULoss")
    det = LFD(backbone=bb, neck=neck, head=head, num_classes=1,
              regression_ranges=((0, 64),),
              point_strides=tuple(bb.num_output_strides_list),
              classification_loss_func=FocalLoss(),
              regression_loss_func=IoULoss(),
              distance_to_bbox_mode="sigmoid")

    config = dict(
        work_dir=str(tmp_path / "work"),
        training_epochs=1,
        display_interval=1,
        save_interval=1,
        seed=1,
        batch_size=4,
        input_hw=(64, 64),
        model=det,
        optimizer=SGD(momentum=0.9, weight_decay=1e-4),
        lr_schedule=ConstantLRSchedule(base_lr=0.01),
        train_data_loader=loader,
        device_augment=make_device_augment(
            64, normalize=make_device_preprocess((0.5,) * 3, (0.5,) * 3)
        ),
    )
    ex = Executor(config)
    ex.run()
    assert any(c.startswith("epoch_") for c in os.listdir(config["work_dir"]))
