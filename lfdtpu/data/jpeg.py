# JPEG decode (stand-in for the reference's vendored libturbojpeg ctypes
# wrapper, `lfd/data_pipeline/dataset/utils/turbojpeg.py`).
#
# Provides the same `decode(bytes) -> BGR/gray ndarray` surface. Tries
# libturbojpeg via ctypes if present on the system, else falls back to
# cv2.imdecode (identical output layout: BGR uint8, grayscale stays 2-D).

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_TJPF_BGR = 1
_TJPF_GRAY = 6
_TJ = None
_TJ_HANDLE = None


def _init_turbojpeg():
    global _TJ, _TJ_HANDLE
    if _TJ is not None:
        return _TJ_HANDLE is not None
    path = ctypes.util.find_library("turbojpeg")
    if path is None:
        _TJ = False
        return False
    try:
        lib = ctypes.CDLL(path)
        lib.tjInitDecompress.restype = ctypes.c_void_p
        lib.tjDecompressHeader3.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_ulong,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.tjDecompress2.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_ulong,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        _TJ = lib
        _TJ_HANDLE = lib.tjInitDecompress()
        return True
    except Exception:
        _TJ = False
        return False


def decode(image_bytes: bytes) -> np.ndarray:
    """Decode JPEG bytes to BGR uint8 HWC (gray images stay 2-D),
    mirroring turbojpeg.decode's autodetect (`turbojpeg.py:249-279`)."""
    if _init_turbojpeg():
        buf = np.frombuffer(image_bytes, dtype=np.uint8)
        src = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
        w = ctypes.c_int()
        h = ctypes.c_int()
        subsamp = ctypes.c_int()
        colorspace = ctypes.c_int()
        ret = _TJ.tjDecompressHeader3(
            _TJ_HANDLE, src, len(image_bytes),
            ctypes.byref(w), ctypes.byref(h),
            ctypes.byref(subsamp), ctypes.byref(colorspace),
        )
        if ret == 0:
            gray = subsamp.value == 3  # TJSAMP_GRAY
            ch = 1 if gray else 3
            out = np.empty((h.value, w.value, ch), dtype=np.uint8)
            dst = out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
            fmt = _TJPF_GRAY if gray else _TJPF_BGR
            if _TJ.tjDecompress2(_TJ_HANDLE, src, len(image_bytes), dst,
                                 w.value, 0, h.value, fmt, 0) == 0:
                return out[:, :, 0] if gray else out
    import cv2

    img = cv2.imdecode(np.frombuffer(image_bytes, dtype=np.uint8), cv2.IMREAD_UNCHANGED)
    if img is None:
        raise ValueError("failed to decode image bytes")
    return img
