# -*- coding: utf-8 -*-
# Single-image prediction demo (reference `TT100K_train/predict.py`).
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import cv2

from lfdtpu import zoo
from lfdtpu.data import TT100K_TYPE45
from lfdtpu.execution import load_checkpoint
from TT100K_augmentation_pipeline import tt100k_val_pipeline


def predict(model_size, param_file_path, image_path,
            classification_threshold=0.4, nms_threshold=0.5, out_path=None):
    model = zoo.tt100k_lfd(model_size)
    state, _ = load_checkpoint(param_file_path, strict=True)
    variables = {"params": state["params"], "batch_stats": state.get("batch_stats", {})}

    image = cv2.imread(image_path, cv2.IMREAD_UNCHANGED)
    results = model.predict_for_single_image(
        variables, image, aug_pipeline=tt100k_val_pipeline,
        classification_threshold=classification_threshold,
        nms_threshold=nms_threshold,
    )
    for bbox in results:
        name = TT100K_TYPE45[int(bbox[0])]
        print(name, bbox)
        cv2.rectangle(image, (int(bbox[2]), int(bbox[3])),
                      (int(bbox[2] + bbox[4]), int(bbox[3] + bbox[5])), (0, 255, 0), 2)
        cv2.putText(image, name, (int(bbox[2]), int(bbox[3]) - 3),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1)
    print("%d signs are detected!" % len(results))
    out_path = out_path or "/tmp/tt100k_predict.jpg"
    cv2.imwrite(out_path, image)
    return results


if __name__ == "__main__":
    predict(
        model_size="L",
        param_file_path="./TT100K_LFD_L_work_dir/epoch_500.ckpt",
        image_path="./test_images/1.jpg",
    )
