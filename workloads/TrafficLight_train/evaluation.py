# -*- coding: utf-8 -*-
# COCO-style mAP evaluation for the TrafficLight workload (reference
# `TrafficLight_train/evaluation.py`): predict every image listed in a
# COCO-format annotation file, feed the COCOEvaluator, print the display
# string. Uses the packed dataset's label->category map like the reference.
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import cv2

from lfdtpu import zoo
from lfdtpu.data import Dataset
from lfdtpu.evaluation import COCOEvaluator
from lfdtpu.execution import load_checkpoint
from TL_augmentation_pipeline import tl_val_pipeline


def evaluate(
    model_size="L",
    param_file_path="./TL_LFD_L_work_dir/epoch_100.ckpt",
    val_annotation_path="./debug_data/annotations/instances_train2017.json",
    val_image_root="./debug_data/images/train2017",
    val_dataset_pkl="./debug_data/train.pkl",
    classification_threshold=0.1,
    nms_threshold=0.3,
):
    model = zoo.trafficlight_lfd(model_size)
    state, _ = load_checkpoint(param_file_path, strict=True)
    variables = {"params": state["params"], "batch_stats": state.get("batch_stats", {})}

    val_dataset = Dataset(load_path=val_dataset_pkl)
    label_indexes_to_category_ids = val_dataset.meta_info[
        "label_indexes_to_category_ids"
    ]
    evaluator = COCOEvaluator(
        annotation_path=val_annotation_path,
        label_indexes_to_category_ids=label_indexes_to_category_ids,
    )

    with open(val_annotation_path) as f:
        images = json.load(f)["images"]

    for i, info in enumerate(images):
        image = cv2.imread(
            os.path.join(val_image_root, info["file_name"]), cv2.IMREAD_UNCHANGED
        )
        results = model.predict_for_single_image(
            variables, image, aug_pipeline=tl_val_pipeline,
            classification_threshold=classification_threshold,
            nms_threshold=nms_threshold,
            class_agnostic=True,
        )
        evaluator.update(([results], [{"image_id": info["id"]}]))
        print("Predicting: %d/%d" % (i, len(images)))

    evaluator.evaluate()
    print(evaluator.get_eval_display_str())
    return evaluator.metrics


if __name__ == "__main__":
    evaluate()
