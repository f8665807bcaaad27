# -*- coding: utf-8 -*-
# Inference latency benchmark for the TrafficLight models (reference
# `TrafficLight_train/timing_inference_latency.py` -> TensorRT engines at
# 1280x720): on TPU, jitted end-to-end engines (device BGR->RGB +
# standard normalize + net + decode + NMS — the TRT numbers exclude
# decode/NMS, so matching them end-to-end is strictly harder).
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

from lfdtpu import zoo
from lfdtpu.deploy import (
    Int8Calibrator,
    inference_latency_evaluation,
    make_device_preprocess,
    quantize_variables_int8,
)

model_size = "S"
precision_mode = "fp32"  # 'fp32' | 'bf16' | 'int8'
resolutions = ((720, 1280),)
timing_loops = 1000

if __name__ == "__main__":
    det = zoo.trafficlight_lfd(model_size)
    variables = det.init(jax.random.PRNGKey(0), (256, 256))
    if precision_mode == "int8":
        # int8 calibration over a fake batch, mirroring the reference's
        # INT8Calibrator example (`timing_inference_latency.py:26-29`)
        import numpy as np

        calib = Int8Calibrator()
        calib.update(np.random.rand(8, 512, 512, 3).astype(np.float32))
        variables = quantize_variables_int8(variables)
    preprocess = make_device_preprocess(
        (0.485, 0.456, 0.406), (0.229, 0.224, 0.225), bgr2rgb=True
    )
    inference_latency_evaluation(
        det,
        variables,
        resolutions=resolutions,
        precisions=(precision_mode,),
        preprocess=preprocess,
        timing_loops=timing_loops,
    )
