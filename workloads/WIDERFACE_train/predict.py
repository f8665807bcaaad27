# -*- coding: utf-8 -*-
# Single-image prediction demo (reference `WIDERFACE_train/predict.py`):
# load a trained checkpoint, predict on a test image, draw boxes.
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import cv2

from lfdtpu import zoo
from lfdtpu.data import simple_widerface_val_pipeline
from lfdtpu.execution import load_checkpoint


def predict(model_size, param_file_path, image_path,
            classification_threshold=0.5, nms_threshold=0.3, out_path=None):
    model = zoo.widerface_lfd(model_size)
    state, _meta = load_checkpoint(param_file_path, strict=True)
    variables = {
        "params": state["params"],
        "batch_stats": state.get("batch_stats", {}),
    }

    image = cv2.imread(image_path, cv2.IMREAD_UNCHANGED)
    results = model.predict_for_single_image(
        variables,
        image,
        aug_pipeline=simple_widerface_val_pipeline,
        classification_threshold=classification_threshold,
        nms_threshold=nms_threshold,
    )
    for bbox in results:
        print(bbox)
        cv2.rectangle(
            image,
            (int(bbox[2]), int(bbox[3])),
            (int(bbox[2] + bbox[4]), int(bbox[3] + bbox[5])),
            (0, 255, 0), 1,
        )
    print("%d faces are detected!" % len(results))
    out_path = out_path or "/tmp/widerface_predict.jpg"
    cv2.imwrite(out_path, image)
    print(f"wrote {out_path}")
    return results


if __name__ == "__main__":
    predict(
        model_size="M",
        param_file_path="./WIDERFACE_LFD_M_work_dir/epoch_1000.ckpt",
        image_path="./test_images/image1.jpg",
    )
