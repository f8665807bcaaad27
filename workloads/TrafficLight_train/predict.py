# -*- coding: utf-8 -*-
# Single-image / folder prediction demo (reference
# `TrafficLight_train/predict.py`): load a trained checkpoint, predict
# class-agnostic on a file or every jpg/png in a folder, draw boxes.
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import cv2

from lfdtpu import zoo
from lfdtpu.execution import load_checkpoint
from TL_augmentation_pipeline import tl_val_pipeline


def _predict_one(model, variables, image_path, classification_threshold,
                 nms_threshold, out_dir=None):
    image = cv2.imread(image_path, cv2.IMREAD_UNCHANGED)
    results = model.predict_for_single_image(
        variables, image, aug_pipeline=tl_val_pipeline,
        classification_threshold=classification_threshold,
        nms_threshold=nms_threshold,
        class_agnostic=True,
    )
    for bbox in results:
        print(bbox)
        cv2.rectangle(
            image, (int(bbox[2]), int(bbox[3])),
            (int(bbox[2] + bbox[4]), int(bbox[3] + bbox[5])), (0, 255, 0), 2,
        )
    print("%d lights are detected!" % len(results))
    out_dir = out_dir or "/tmp"
    base = os.path.basename(image_path)
    out_path = os.path.join(out_dir, base.rsplit(".", 1)[0] + "_result.jpg")
    cv2.imwrite(out_path, image)
    print(f"wrote {out_path}")
    return results


def predict(model_size, param_file_path, image_path,
            classification_threshold=0.5, nms_threshold=0.3, out_dir=None):
    model = zoo.trafficlight_lfd(model_size)
    state, _ = load_checkpoint(param_file_path, strict=True)
    variables = {"params": state["params"], "batch_stats": state.get("batch_stats", {})}

    if os.path.isfile(image_path):
        return _predict_one(model, variables, image_path,
                            classification_threshold, nms_threshold, out_dir)
    # folder mode, like the reference's `./test-imgs` branch
    paths = [
        os.path.join(image_path, f)
        for f in sorted(os.listdir(image_path))
        if f.endswith(("jpg", "png"))
    ]
    return [
        _predict_one(model, variables, p, classification_threshold,
                     nms_threshold, out_dir)
        for p in paths
    ]


if __name__ == "__main__":
    predict(
        model_size="L",
        param_file_path="./TL_LFD_L_work_dir/epoch_100.ckpt",
        image_path="./test-imgs",
    )
