# -*- coding: utf-8 -*-
# Inference latency benchmark (reference
# `WIDERFACE_train/timing_inference_latency.py` -> TensorRT engines):
# on TPU, sweep resolutions x precisions with jitted end-to-end engines
# (device preprocess + net + decode + NMS, which the TRT numbers exclude).
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

model_size = "XS"
precision_mode = "bf16"  # 'fp32' | 'bf16' | 'int8'
resolutions = ((480, 640), (720, 1280), (1080, 1920), (2160, 3840))
timing_loops = 50

if __name__ == "__main__":
    det = zoo.widerface_lfd(model_size)
    variables = det.init(jax.random.PRNGKey(0), (256, 256))
    if precision_mode == "int8":
        # int8 calibration (reference builds an INT8Calibrator over real
        # crops; random batch mirrors its fake-batch example)
        import numpy as np

        calib = Int8Calibrator()
        calib.update(np.random.rand(8, 512, 512, 3).astype(np.float32))
        variables = quantize_variables_int8(variables)
    preprocess = make_device_preprocess((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    inference_latency_evaluation(
        det,
        variables,
        resolutions=resolutions,
        precisions=(precision_mode,),
        preprocess=preprocess,
        timing_loops=timing_loops,
    )
