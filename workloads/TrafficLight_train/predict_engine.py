# -*- coding: utf-8 -*-
# Prediction through a compiled deployment engine (reference
# `TrafficLight_train/predict_tensorrt.py` — ONNX->TRT + pycuda buffers;
# on TPU one jitted end-to-end engine incl. decode+NMS).
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import cv2
import numpy as np

from lfdtpu import zoo
from lfdtpu.deploy import compile_inference, make_device_preprocess, quantize_variables_int8
from lfdtpu.execution import load_checkpoint
from lfdtpu.models import pad_to_multiple
from lfdtpu.ops.decode import detections_to_lists


def predict_with_engine(
    model_size,
    param_file_path,
    image_path,
    precision="bf16",
    classification_threshold=0.5,
    nms_threshold=0.3,
    out_path=None,
    engine_file=None,
):
    image = cv2.imread(image_path, cv2.IMREAD_UNCHANGED)
    h, w = image.shape[:2]

    if engine_file is not None and os.path.exists(engine_file):
        # TRT engine-file workflow (`predict_tensorrt.py` deserializes
        # *.trt): restore the serialized program without rebuilding
        from lfdtpu.deploy.engine_io import load_engine, predict_padded

        decoded = predict_padded(load_engine(engine_file), image)
    else:
        det = zoo.trafficlight_lfd(model_size)
        state, _ = load_checkpoint(param_file_path, strict=True)
        variables = {"params": state["params"], "batch_stats": state.get("batch_stats", {})}
        if precision == "int8":
            variables = quantize_variables_int8(variables)

        padded = pad_to_multiple(image, max(det.point_strides))

        preprocess = make_device_preprocess(
            (0.485, 0.456, 0.406), (0.229, 0.224, 0.225), bgr2rgb=True
        )
        engine = compile_inference(
            det, variables, padded.shape[:2], precision=precision,
            preprocess=preprocess,
            classification_threshold=classification_threshold,
            nms_threshold=nms_threshold,
            class_agnostic=True,
        )
        if engine_file is not None:
            from lfdtpu.deploy.engine_io import save_engine

            save_engine(engine, engine_file)
        decoded = engine(padded[None], np.asarray([h, w], np.float32))
    results = detections_to_lists({k: v[0] for k, v in decoded.items()})

    for bbox in results:
        print(bbox)
        cv2.rectangle(
            image, (int(bbox[2]), int(bbox[3])),
            (int(bbox[2] + bbox[4]), int(bbox[3] + bbox[5])), (0, 255, 0), 2,
        )
    print("%d lights are detected!" % len(results))
    out_path = out_path or "/tmp/tl_predict_engine.jpg"
    cv2.imwrite(out_path, image)
    return results


if __name__ == "__main__":
    predict_with_engine(
        model_size="L",
        param_file_path="./TL_LFD_L_work_dir/epoch_100.ckpt",
        image_path="./test-imgs/1.jpg",
    )
