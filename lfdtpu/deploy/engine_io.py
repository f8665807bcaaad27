# Engine serialization: build once, write to disk, reload without
# retracing — the TPU-native analogue of the reference's TensorRT engine
# files (`lfd/deployment/tensorrt/build_engine.py:141-152` serializes the
# built engine; `predict_tensorrt.py` deserializes it at startup).
#
# On TPU the "engine" is the jitted end-to-end program. `save_engine`
# AOT-exports it as versioned StableHLO bytes (jax.export) together with
# the device-held weights/constants; `load_engine` restores a callable
# with the same `__call__(images, valid_hw)` surface without re-tracing
# the model (deserialization skips tracing; XLA compilation of the
# portable StableHLO still runs once on the loading machine, like TRT's
# engine deserialization does its own device setup).

from __future__ import annotations

import io
import json
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export


_MAGIC = "lfdtpu-engine-v2"


# The file format is pickle-free: meta is JSON and the consts pytree
# structure is a small recursive descriptor (dict/tuple/list/None/leaf)
# rebuilt structurally at load — loading an engine file never executes
# code from it (the TRT engine files being mimicked are not pickle-based
# either).
def _encode_struct(obj, leaves):
    if obj is None:
        return ["none"]
    if isinstance(obj, dict):
        return ["dict", [[str(k), _encode_struct(v, leaves)] for k, v in obj.items()]]
    if isinstance(obj, (tuple, list)):
        tag = "tuple" if isinstance(obj, tuple) else "list"
        return [tag, [_encode_struct(v, leaves) for v in obj]]
    leaves.append(np.asarray(obj))
    return ["leaf", len(leaves) - 1]


def _decode_struct(desc, leaves):
    tag = desc[0]
    if tag == "none":
        return None
    if tag == "dict":
        return {k: _decode_struct(v, leaves) for k, v in desc[1]}
    if tag == "tuple":
        return tuple(_decode_struct(v, leaves) for v in desc[1])
    if tag == "list":
        return [_decode_struct(v, leaves) for v in desc[1]]
    return leaves[desc[1]]


# np.savez round-trips ml_dtypes arrays (bfloat16 etc.) as raw void
# dtypes; store them bit-cast to uint16 with a dtype tag instead.
def _savable(arr):
    if arr.dtype == jnp.bfloat16:
        return arr.view(np.uint16), "bfloat16"
    return arr, str(arr.dtype)


def _restore(arr, dtype_tag):
    if dtype_tag == "bfloat16":
        return arr.view(jnp.bfloat16)
    return arr


def save_engine(engine, path):
    """Serialize a compiled inference engine to one file.

    engine: the object returned by `compile_inference` (its closed-over
    jitted program and device constants are extracted via the Engine
    attributes). Writes a zip with the exported StableHLO and the
    weight/constant arrays.
    """
    fn, consts = engine.export_parts()
    # consts: tuple of pytrees that are positional args 0..k-1 of fn;
    # the remaining args are (images, valid_hw) provided at call time.
    const_leaves = []
    const_desc = _encode_struct(tuple(jax.device_get(c) for c in consts),
                                const_leaves)

    example = engine.example_args()
    args = tuple(consts) + tuple(example)
    exported = jax_export.export(fn)(*args)
    blob = exported.serialize()

    stored = [_savable(l) for l in const_leaves]
    meta = dict(
        magic=_MAGIC,
        precision=engine.precision_mode,
        input_resolution=list(engine.input_resolution),
        const_struct=const_desc,
        const_dtypes=[tag for _, tag in stored],
        example_shapes=[[list(a.shape), str(a.dtype)] for a in example],
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as z:
        z.writestr("meta.json", json.dumps(meta))
        z.writestr("program.stablehlo", bytes(blob))
        buf = io.BytesIO()
        np.savez(buf, **{f"c{i}": a for i, (a, _) in enumerate(stored)})
        z.writestr("consts.npz", buf.getvalue())
    return path


class LoadedEngine:
    """Engine restored from disk: same surface as compile_inference's."""

    def __init__(self, call, precision, input_resolution, vhw_shape=None):
        self._call = call
        self.precision_mode = precision
        self.input_resolution = input_resolution
        self._vhw_shape = tuple(vhw_shape) if vhw_shape else (2,)

    def __call__(self, images, valid_hw):
        vhw = jnp.asarray(valid_hw, jnp.float32)
        if vhw.ndim == 1 and len(self._vhw_shape) == 2:
            # exported program wants per-image (B, 2) extents; broadcast
            # the shared (2,) extent over the batch
            vhw = jnp.tile(vhw[None, :], (self._vhw_shape[0], 1))
        return self._call(images, vhw)


def predict_padded(engine, image):
    """Run one HWC image through an engine, zero-padding to its input
    resolution (the standard predict-through-engine-file flow used by the
    workload `predict_engine.py --engine-file` paths)."""
    h, w = image.shape[:2]
    eh, ew = engine.input_resolution
    assert h <= eh and w <= ew, (
        f"image {h}x{w} exceeds engine resolution {eh}x{ew}")
    padded = np.zeros((eh, ew) + image.shape[2:], image.dtype)
    padded[:h, :w] = image
    return engine(padded[None], np.asarray([h, w], np.float32))


def load_engine(path):
    """Restore an engine written by save_engine.

    No model code or config is needed — the program and its constants are
    self-contained (like deserializing a TRT engine file).
    """
    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("meta.json"))
        assert meta["magic"] == _MAGIC, f"not an lfdtpu engine file: {path}"
        blob = z.read("program.stablehlo")
        npz = np.load(io.BytesIO(z.read("consts.npz")))
        tags = meta.get("const_dtypes") or [None] * len(npz.files)
        const_leaves = [
            _restore(npz[f"c{i}"], tags[i]) for i in range(len(npz.files))
        ]

    exported = jax_export.deserialize(bytearray(blob))
    consts = _decode_struct(meta["const_struct"], const_leaves)
    consts = tuple(jax.device_put(c) for c in consts)
    call_exported = jax.jit(exported.call)

    def call(images, valid_hw):
        return call_exported(*consts, images, valid_hw)

    vhw_shape = None
    shapes = meta.get("example_shapes")
    if shapes and len(shapes) == 2:
        vhw_shape = shapes[1][0]
    return LoadedEngine(call, meta["precision"], tuple(meta["input_resolution"]),
                        vhw_shape=vhw_shape)
