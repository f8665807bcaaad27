# Native (C++) host-side kernels, loaded via ctypes.
#
# TPU-native equivalents of the reference's C++/CUDA extensions where a host
# CPU kernel still makes sense (the device hot path lives in jnp/Pallas):
#   - greedy NMS / soft-NMS for the numpy `nms()` public API
#     (reference `lfd/model/utils/build/nms/`)
# Built by `make -C lfdtpu/native` (see Makefile); falls back to numpy
# automatically when the .so is absent.

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(os.path.dirname(__file__), "liblfd_native.so")
    if os.path.exists(so):
        lib = ctypes.CDLL(so)
        lib.lfd_nms.restype = ctypes.c_int
        lib.lfd_nms.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # dets (K, 5)
            ctypes.c_int,  # K
            ctypes.c_float,  # iou_thr
            ctypes.POINTER(ctypes.c_int64),  # out keep indices
        ]
        lib.lfd_soft_nms.restype = ctypes.c_int
        lib.lfd_soft_nms.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # dets (K, 5), modified in place
            ctypes.c_int,
            ctypes.c_float,  # iou_thr
            ctypes.c_int,  # method: 1 linear, 2 gaussian
            ctypes.c_float,  # sigma
            ctypes.c_float,  # min_score
            ctypes.POINTER(ctypes.c_int64),
        ]
        _LIB = lib
    return _LIB


def available():
    return _load() is not None


def nms_native(dets: np.ndarray, iou_thr: float) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built")
    dets = np.ascontiguousarray(dets, dtype=np.float32)
    k = dets.shape[0]
    out = np.empty((k,), dtype=np.int64)
    n = lib.lfd_nms(
        dets.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        k,
        iou_thr,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out[:n]


def soft_nms_native(dets: np.ndarray, iou_thr: float, method: int, sigma: float, min_score: float):
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built")
    dets = np.ascontiguousarray(dets, dtype=np.float32).copy()
    k = dets.shape[0]
    out = np.empty((k,), dtype=np.int64)
    n = lib.lfd_soft_nms(
        dets.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        k,
        iou_thr,
        method,
        sigma,
        min_score,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return dets[:n], out[:n]
