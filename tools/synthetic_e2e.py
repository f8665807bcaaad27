#!/usr/bin/env python
"""Full-pipeline accuracy validation on synthetic data.

Generates a synthetic detection dataset (bright rectangles of two classes
on textured noise), packs it with the Dataset/pack machinery, trains a
small LFD through the Executor (threaded loader, warmup schedule, grad
clip, checkpointing), then evaluates with the pure-numpy COCO evaluator
via the val loop. Passes when mAP_50 exceeds the threshold — evidence the
whole stack (data -> assignment -> loss -> optimizer -> decode -> NMS ->
evaluator) learns, without any real dataset.

Run: python tools/synthetic_e2e.py [--epochs N]
"""
import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_dataset(n, seed, size=128):
    rng = np.random.RandomState(seed)
    samples = {}
    ann_id = 1
    coco = {"images": [], "annotations": [],
            "categories": [{"id": 1, "name": "bright"}, {"id": 2, "name": "dark"}]}
    for i in range(n):
        img = (rng.rand(size, size, 3) * 60 + 60).astype(np.uint8)
        boxes, labels = [], []
        for _ in range(rng.randint(1, 4)):
            w, h = rng.randint(18, 48, 2)
            x = rng.randint(0, size - w)
            y = rng.randint(0, size - h)
            cls = rng.randint(0, 2)
            color = (230, 220, 210) if cls == 0 else (15, 25, 20)
            img[y:y + h, x:x + w] = color
            boxes.append([int(x), int(y), int(w), int(h)])
            labels.append(cls)
        s = {"image": img, "image_id": i + 1}
        s["bboxes"] = boxes
        s["bbox_labels"] = labels
        samples[i] = s
        coco["images"].append({"id": i + 1, "height": size, "width": size,
                               "file_name": f"{i}.jpg"})
        for b, l in zip(boxes, labels):
            coco["annotations"].append({"id": ann_id, "image_id": i + 1,
                                        "category_id": l + 1, "bbox": b,
                                        "iscrowd": 0, "area": b[2] * b[3]})
            ann_id += 1
    return samples, coco


class MemDataset:
    def __init__(self, samples):
        self._s = samples

    def __getitem__(self, i):
        return self._s[i]

    def __len__(self):
        return len(self._s)

    def get_indexes(self):
        return list(self._s.keys())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--threshold", type=float, default=0.5)
    args = ap.parse_args()

    from lfdtpu.data import (
        Compose, DataLoader, IdleRegionSampler, RandomBBoxCropRegionSampler,
        RandomDatasetSampler, simple_normalize,
    )
    from lfdtpu.evaluation import COCOEvaluator
    from lfdtpu.execution import (
        Executor, MultiStepLRSchedule, SGD, WarmupSetting,
    )
    from lfdtpu.models import LFD, LFDHead, LFDResNet, SimpleNeck
    from lfdtpu.ops.loss_wrappers import FocalLoss, IoULoss

    train_samples, _ = make_dataset(64, seed=0)
    val_samples, val_coco = make_dataset(16, seed=1)
    tmp = tempfile.mkdtemp()
    ann_path = os.path.join(tmp, "val.json")
    with open(ann_path, "w") as f:
        json.dump(val_coco, f)

    train_ds, val_ds = MemDataset(train_samples), MemDataset(val_samples)
    bb = LFDResNet(block_mode="faster", stem_mode="faster", body_mode=None,
                   stem_channels=32, body_architecture=(2, 1), body_channels=(32, 64),
                   out_indices=((0, 1), (1, 0)), norm_cfg=dict(type="BatchNorm2d"))
    neck = SimpleNeck(num_neck_channels=64,
                      num_input_strides_list=tuple(bb.num_output_strides_list),
                      norm_cfg=dict(type="BatchNorm2d"))
    head = LFDHead(num_classes=2, num_heads=2, num_head_channels=64,
                   num_conv_layers=1, norm_cfg=dict(type="GroupNorm", num_groups=8),
                   share_head_flag=True, merge_path_flag=True,
                   classification_loss_type="FocalLoss", regression_loss_type="IoULoss")
    det = LFD(backbone=bb, neck=neck, head=head, num_classes=2,
              regression_ranges=((0, 40), (40, 128)),
              point_strides=tuple(bb.num_output_strides_list),
              classification_loss_func=FocalLoss(), regression_loss_func=IoULoss(),
              distance_to_bbox_mode="sigmoid", classification_threshold=0.3)

    pipeline = Compose([simple_normalize])
    train_loader = DataLoader(
        train_ds, RandomDatasetSampler(train_ds, batch_size=16, seed=0),
        RandomBBoxCropRegionSampler(crop_size=128, resize_range=(0.8, 1.25), resize_prob=0.5),
        augmentation_pipeline=pipeline, num_workers=2, max_boxes_per_image=8,
    )
    val_loader = DataLoader(
        val_ds, RandomDatasetSampler(val_ds, batch_size=16, shuffle=False, seed=0),
        IdleRegionSampler(), augmentation_pipeline=pipeline,
        num_workers=1, max_boxes_per_image=8,
    )
    evaluator = COCOEvaluator(ann_path, {0: 1, 1: 2})

    config = dict(
        work_dir=os.path.join(tmp, "work"),
        training_epochs=args.epochs, display_interval=20,
        save_interval=10**6, val_interval=args.epochs,
        seed=0, batch_size=16, input_hw=(128, 128),
        model=det, optimizer=SGD(momentum=0.9, weight_decay=1e-4),
        lr_schedule=MultiStepLRSchedule(
            base_lr=0.05, milestones=(int(args.epochs * 0.7),), gamma=0.1,
            warmup=WarmupSetting(warmup_mode="linear", warmup_loops=40, warmup_ratio=0.1),
        ),
        optimizer_grad_clip_cfg=dict(max_norm=10, duration=3),
        train_data_loader=train_loader, val_data_loader=val_loader,
        evaluator=evaluator,
    )
    ex = Executor(config)
    ex.run()
    metrics = evaluator.metrics
    print("FINAL METRICS:", metrics)
    assert metrics.get("mAP_50", 0) > args.threshold, (
        f"mAP_50 {metrics.get('mAP_50')} below {args.threshold}"
    )
    print("SYNTHETIC E2E OK")


if __name__ == "__main__":
    main()
