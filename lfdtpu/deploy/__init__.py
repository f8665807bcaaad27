from .compile import (compile_inference, make_device_preprocess,
                      cast_variables, unpack_detections)
from .latency import timing_inference, inference_latency_evaluation
from .quantize import Int8Calibrator, quantize_variables_int8
from .int8_net import (
    int8_interception,
    int8_apply,
    calibrate_activation_scales,
    ActScaleObserver,
)
from .engine_io import save_engine, load_engine, predict_padded
from .buckets import BucketedEngineSet
from .serving import run_stream, StreamingServer

__all__ = [
    "compile_inference",
    "make_device_preprocess",
    "cast_variables",
    "timing_inference",
    "inference_latency_evaluation",
    "Int8Calibrator",
    "quantize_variables_int8",
    "int8_interception",
    "int8_apply",
    "calibrate_activation_scales",
    "ActScaleObserver",
    "save_engine",
    "load_engine",
    "predict_padded",
    "BucketedEngineSet",
    "run_stream",
    "StreamingServer",
]
