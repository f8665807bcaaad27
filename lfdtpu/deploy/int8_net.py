# True int8 inference path: convs run as int8 x int8 -> int32 convolutions
# with per-output-channel weight scales and static (calibrated) per-tensor
# activation scales.
#
# Two generations live here:
#
# 1. THE FUSED CHAIN (round 3, used by compile_inference(precision="int8")):
#    activations stay int8 ACROSS the backbone. Each ConvNormAct becomes
#    conv_int8 -> one fused epilogue int32 * (s_in*w_scale*bn_scale) +
#    folded_bias -> relu -> requant to the NEXT static scale -> int8, so
#    there is no f32 HBM round trip between convs. Residual blocks add the
#    identity in the f32 epilogue of their last conv. GroupNorm heads (and
#    anything else int8-ineligible) get a single dequant at entry.
#    Measured per-conv at 272x480x64 (tools/kernel_lab slope method):
#    bf16 0.395 ms | int8 fused 0.446 ms | int8 unfused-static 0.746 ms —
#    i.e. the old per-conv round trip was the 41 ms engine's killer. The
#    XLA int8 conv itself runs at ~bf16 rate per-op (no MXU 2x exposed;
#    a shift-epilogue int8 conv measures 0.475 ms), yet END-TO-END the
#    fused chain is the FASTEST engine mode — 6.38 ms vs bf16 6.76 ms at
#    1080p-L (campaign_r3, BENCH.md) — because int8 activations halve the
#    HBM traffic between convs on this bandwidth-bound backbone. The
#    per-conv kernel-lab numbers measure isolated dispatches and miss
#    that; trust the end-to-end engine measurement.
#
# 2. The legacy per-conv interceptor (int8_interception/int8_apply), kept
#    for tests and as the dynamic-scale calibration-free fallback. It pays
#    a quantize+dequantize pass per conv and is NOT used by engines.
#
# Reference analogue: `lfd/deployment/tensorrt/build_engine.py:22-71`
# (INT8Calibrator + int8 engine build).

from __future__ import annotations

import contextlib

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..models.blocks import FastBlock, FasterBlock, FastestBlock, _Shortcut
from ..models.layers import BN_EPS, ConvNormAct


def _conv_padding(mod):
    p = mod.padding
    return p if isinstance(p, str) else p


def _quantize_weights(kernel):
    """Per-output-channel symmetric int8 quantization of an HWIO kernel."""
    amax = jnp.max(jnp.abs(kernel), axis=(0, 1, 2), keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(kernel / scale), -127, 127).astype(jnp.int8)
    return q, scale[0, 0, 0, :]  # (Cout,)


def _int8_conv(mod, x, act_scale, w_scale=None):
    kernel = mod.variables["params"]["kernel"]
    bias = mod.variables["params"].get("bias")

    if act_scale is None:  # dynamic per-tensor activation scale
        act_scale = jnp.maximum(jnp.max(jnp.abs(x)), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x / act_scale), -127, 127).astype(jnp.int8)
    if kernel.dtype == jnp.int8:
        # weights pre-quantized at engine build (prequantize_weights):
        # no per-call abs-max/round over the kernel
        wq = kernel
        assert w_scale is not None, "int8 kernel needs its per-channel scale"
    else:
        wq, w_scale = _quantize_weights(kernel)

    strides = mod.strides if isinstance(mod.strides, tuple) else (mod.strides, mod.strides)
    y = jax.lax.conv_general_dilated(
        xq,
        wq,
        window_strides=strides,
        padding=_conv_padding(mod),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=mod.feature_group_count,
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (act_scale * w_scale)
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)


class ActScaleObserver:
    """Collects per-conv activation amax over calibration batches
    (keyed by the module path). Use via int8_interception(observer=...)."""

    def __init__(self):
        self.amax = {}

    def update(self, path, value):
        v = float(value)
        self.amax[path] = max(self.amax.get(path, 0.0), v)

    def scales(self):
        return {k: max(v, 1e-8) / 127.0 for k, v in self.amax.items()}


def prequantize_weights(variables):
    """Quantize every conv kernel to int8 ONCE at engine build.

    Returns (variables with int8 kernels, {module_path: (Cout,) f32 weight
    scales}). The int8 engine then does zero per-call weight work — only
    activations are quantized at runtime. Paths match the interceptor's
    "/".join(module.path) keys (params scope without the 'params' root)."""
    params = variables["params"]
    scales = {}

    def walk(tree, path):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                if "kernel" in v and getattr(v["kernel"], "ndim", 0) == 4:
                    q, s = _quantize_weights(jnp.asarray(v["kernel"]))
                    scales["/".join(path + (k,))] = s
                    out[k] = dict(v, kernel=q)
                else:
                    out[k] = walk(v, path + (k,))
            else:
                out[k] = v
        return out

    new_params = walk(params, ())
    return dict(variables, params=new_params), scales


@contextlib.contextmanager
def int8_interception(act_scales=None, observer=None, weight_scales=None):
    """Context manager: inside it, detector.net.apply runs convs in int8.

    act_scales: {module_path_str: float} static activation scales (from a
      calibration pass); missing entries fall back to dynamic scales.
    observer: when set, convs run in the original dtype but activation amax
      values are recorded per path (calibration mode; use OUTSIDE jit).
    weight_scales: {module_path_str: (Cout,)} from prequantize_weights when
      the kernels in `variables` are already int8.
    """

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if not isinstance(mod, nn.Conv) or context.method_name != "__call__":
            return next_fun(*args, **kwargs)
        x = args[0]
        path = "/".join(str(p) for p in mod.path)
        if observer is not None:
            observer.update(path, jnp.max(jnp.abs(x)))
            return next_fun(*args, **kwargs)
        scale = None
        if act_scales is not None and path in act_scales:
            scale = jnp.float32(act_scales[path])
        wscale = weight_scales.get(path) if weight_scales is not None else None
        return _int8_conv(mod, x, scale, w_scale=wscale)

    with nn.intercept_methods(interceptor):
        yield


def calibrate_activation_scales(detector, variables, batches, preprocess=None):
    """Collect per-conv activation amax over calibration batches.

    Runs as ONE jitted call per batch that returns every conv's amax —
    never eager: flooding this backend with eager op dispatches permanently
    degrades the process's per-call latency (measured 0.3 ms -> 40 ms for
    all subsequent compiled calls). Returns {path: scale}.
    """

    names = []

    def traced(variables, x):
        if preprocess is not None:
            x = preprocess(x)
        x = x.astype(jnp.float32)
        collected = []
        names.clear()

        def interceptor(next_fun, args, kwargs, context):
            mod = context.module
            if isinstance(mod, nn.Conv) and context.method_name == "__call__":
                names.append("/".join(str(p) for p in mod.path))
                collected.append(jnp.max(jnp.abs(args[0])))
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(interceptor):
            detector.net.apply(variables, x, train=False)
        # single stacked vector: one D2H transfer per batch (multi-array
        # transfers degrade this backend's process permanently)
        return jnp.stack(collected)

    jitted = jax.jit(traced)
    amax = None
    for batch in batches:
        vec = np.asarray(jitted(variables, jnp.asarray(batch)))
        amax = vec if amax is None else np.maximum(amax, vec)
    return {
        k: max(float(v), 1e-8) / 127.0 for k, v in zip(names, amax)
    }


def int8_apply(detector, variables, images, act_scales=None):
    """Forward pass with int8 convs (jit-safe; close over act_scales dict
    of python floats only)."""
    with int8_interception(act_scales=act_scales):
        return detector.net.apply(variables, images, train=False)


# --------------------------------------------------------------------------
# Fused int8 chain (engine path)
# --------------------------------------------------------------------------

_BLOCKS = (FastBlock, FasterBlock, FastestBlock)
_BLOCK_CNA_KERNELS = {FastBlock: (3, 1, 3), FasterBlock: (3, 3), FastestBlock: (3, 3)}


def calibrate_module_amax(detector, variables, batches, preprocess=None):
    """Per-module activation amax for the fused int8 chain.

    Records the INPUT and OUTPUT abs-max of every ConvNormAct / residual
    block / _Shortcut (keys `<path>#in` / `<path>#out`) plus the
    preprocessed net input (`__input__#out`), maximized over `batches` of
    raw frames. One jitted call per batch (eager floods degrade this
    backend's process; see calibrate_activation_scales). The result is a
    plain {str: float} dict — pass it to compile_inference(act_scales=...).
    """
    names = []

    def traced(variables, x):
        if preprocess is not None:
            x = preprocess(x)
        x = x.astype(jnp.float32)
        names.clear()
        collected = []

        def interceptor(next_fun, args, kwargs, context):
            mod = context.module
            if (
                isinstance(mod, _BLOCKS + (ConvNormAct, _Shortcut))
                and context.method_name == "__call__"
            ):
                path = "/".join(str(p) for p in mod.path)
                names.append(path + "#in")
                collected.append(jnp.max(jnp.abs(args[0])))
                out = next_fun(*args, **kwargs)
                names.append(path + "#out")
                collected.append(jnp.max(jnp.abs(out)))
                return out
            return next_fun(*args, **kwargs)

        names.append("__input__#out")
        collected.append(jnp.max(jnp.abs(x)))
        with nn.intercept_methods(interceptor):
            detector.net.apply(variables, x, train=False)
        return jnp.stack(collected)

    jitted = jax.jit(traced)
    amax = None
    for batch in batches:
        vec = np.asarray(jitted(variables, jnp.asarray(batch)))
        amax = vec if amax is None else np.maximum(amax, vec)
    return {k: float(v) for k, v in zip(names, amax)}


def _scale_of(amax_value):
    return max(float(amax_value), 1e-8) / 127.0


def _quantize_to(x, scale):
    return jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / scale)), -127, 127
                    ).astype(jnp.int8)


def _conv_int8(x8, kernel, w_scale, stride, padding):
    if kernel.dtype != jnp.int8:
        kernel, w_scale = _quantize_weights(kernel)
    y = jax.lax.conv_general_dilated(
        x8, kernel, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return y, w_scale


def _folded_norm(tree, stats):
    """Per-channel (scale, bias) folding an optional BatchNorm + conv bias:
    bn(conv + b) == scale*conv + (scale*b + bn_bias)."""
    conv = tree["Conv_0"]
    bias = conv.get("bias")
    if "Norm_0" in tree:
        bn = tree["Norm_0"]["BatchNorm_0"]
        st = stats["Norm_0"]["BatchNorm_0"]
        scale = bn["scale"].astype(jnp.float32) * jax.lax.rsqrt(
            st["var"].astype(jnp.float32) + BN_EPS
        )
        b = bn["bias"].astype(jnp.float32) - st["mean"].astype(jnp.float32) * scale
        if bias is not None:
            b = b + bias.astype(jnp.float32) * scale
    else:
        cout = conv["kernel"].shape[-1]
        scale = jnp.ones((cout,), jnp.float32)
        b = bias.astype(jnp.float32) if bias is not None else jnp.zeros(
            (cout,), jnp.float32)
    return scale, b


def _cna_int8(tree, stats, w_scale, x8, s_in, *, kernel_size, stride, relu,
              out_scale):
    """One ConvNormAct as int8 conv + single fused epilogue.

    Returns int8 requantized to `out_scale` when given, else the f32
    dequantized tensor (for epilogues that continue in f32, e.g. the
    pre-residual last conv of a block)."""
    kernel = tree["Conv_0"]["kernel"]
    p = kernel_size // 2
    y, w_scale = _conv_int8(x8, kernel, w_scale, stride, [(p, p), (p, p)])
    nscale, nbias = _folded_norm(tree, stats)
    f = y.astype(jnp.float32) * (s_in * w_scale.astype(jnp.float32) * nscale) + nbias
    if relu:
        f = jnp.maximum(f, 0.0)
    if out_scale is None:
        return f
    return _quantize_to(f, out_scale)


class _Tracker:
    """Maps traced int8 arrays to their (static python float) scales.

    Keyed by object identity within one trace; every registered array is
    pinned so ids cannot be recycled by the GC mid-trace."""

    def __init__(self):
        self._scales = {}
        self._pins = []

    def set(self, arr, scale):
        self._scales[id(arr)] = scale
        self._pins.append(arr)
        return arr

    def get(self, arr):
        return self._scales.get(id(arr))


def _cna_eligible(mod):
    norm_ok = mod.norm_cfg is None or mod.norm_cfg.get("type") == "BatchNorm2d"
    act_ok = mod.act_cfg is None or mod.act_cfg.get("type") == "ReLU"
    return norm_ok and act_ok


def _block_eligible(mod):
    norm = mod.norm_cfg if mod.norm_cfg is not None else {"type": "BatchNorm2d"}
    act = mod.act_cfg or {"type": "ReLU"}
    return norm.get("type") == "BatchNorm2d" and act.get("type") == "ReLU"


def _in_scale(mod, x, amax, tracker):
    """(x8, s) for a module input: already-tracked int8, or statically
    quantized f32 using the module's calibrated input amax."""
    s = tracker.get(x)
    if s is not None:
        return x, s
    if x.dtype == jnp.int8:
        return None, None  # int8 from an untracked source: refuse
    path = "/".join(str(p) for p in mod.path)
    a = amax.get(path + "#in")
    if a is None:
        return None, None
    s = _scale_of(a)
    return _quantize_to(x, s), s


def _block_int8(mod, x, amax, w_scales, tracker):
    """A residual block as a fused int8 chain: mid activations requantize
    to their calibrated scales; the last conv dequantizes into f32 where
    the identity is added and relu'd, then one requant to the block's
    output scale. Returns None when the block cannot run fused."""
    path = "/".join(str(p) for p in mod.path)
    if not _block_eligible(mod) or (path + "#out") not in amax:
        return None
    x8, s_x = _in_scale(mod, x, amax, tracker)
    if x8 is None:
        return None
    params = mod.variables["params"]
    stats = mod.variables.get("batch_stats", {})
    kernels = _BLOCK_CNA_KERNELS[type(mod)]

    h8, s_h = x8, s_x
    f = None
    for i, k in enumerate(kernels):
        name = f"ConvNormAct_{i}"
        last = i == len(kernels) - 1
        out_scale = None if last else _scale_of(amax[f"{path}/{name}#out"])
        out = _cna_int8(
            params[name], stats.get(name, {}),
            None if w_scales is None else w_scales.get(f"{path}/{name}/Conv_0"),
            h8, s_h, kernel_size=k, stride=mod.stride if i == 0 else 1,
            relu=not last, out_scale=out_scale,
        )
        if last:
            f = out
        else:
            h8, s_h = out, out_scale
    if mod.use_downsample:
        identity = _cna_int8(
            params["_Shortcut_0"], stats.get("_Shortcut_0", {}),
            None if w_scales is None else w_scales.get(f"{path}/_Shortcut_0/Conv_0"),
            x8, s_x, kernel_size=1, stride=mod.stride, relu=False, out_scale=None,
        )
    else:
        identity = x8.astype(jnp.float32) * s_x
    out = jnp.maximum(f + identity, 0.0)
    s_out = _scale_of(amax[path + "#out"])
    return tracker.set(_quantize_to(out, s_out), s_out)


def _standalone_cna_int8(mod, x, amax, w_scales, tracker):
    """A ConvNormAct outside any block (stem / neck / BN- or norm-free
    heads): int8 in -> int8 out, requantized to its calibrated output
    scale. Returns None when it cannot run fused."""
    path = "/".join(str(p) for p in mod.path)
    if not _cna_eligible(mod) or (path + "#out") not in amax:
        return None
    x8, s_in = _in_scale(mod, x, amax, tracker)
    if x8 is None:
        return None
    s_out = _scale_of(amax[path + "#out"])
    out = _cna_int8(
        mod.variables["params"], mod.variables.get("batch_stats", {}),
        None if w_scales is None else w_scales.get(path + "/Conv_0"),
        x8, s_in, kernel_size=int(mod.kernel_size), stride=int(mod.stride),
        relu=mod.act_cfg is not None, out_scale=s_out,
    )
    return tracker.set(out, s_out)


def _dequant_args(args, tracker, dtype):
    """Dequantize any tracked int8 arrays in args (handoff to modules that
    must run in float: GroupNorm heads, final convs, ...)."""
    out = []
    for a in args:
        s = tracker.get(a) if hasattr(a, "dtype") else None
        out.append((a.astype(jnp.float32) * s).astype(dtype) if s is not None else a)
    return tuple(out)


def int8_fused_apply(net, variables, images_f32, amax, weight_scales=None,
                     dequant_dtype=jnp.float32, quantize_input=True,
                     skip_stem0=False, capture=None):
    """Run `net.apply` with the fused int8 chain.

    images_f32: preprocessed float frames; quantized ONCE with the
    calibrated `__input__#out` amax. amax: calibrate_module_amax output.
    weight_scales: per-conv (Cout,) scales when `variables` holds
    prequantized int8 kernels (prequantize_weights); None (the engine
    default) quantizes kernels at trace time. CAUTION with prequantized
    kernels: modules that fall through to the float path (GroupNorm heads,
    final convs) read kernels as raw numbers — only pass prequantized
    variables for nets whose EVERY conv is int8-eligible.
    Ineligible modules (GroupNorm heads etc.) receive a single dequant to
    `dequant_dtype` and run unchanged.

    quantize_input=False / skip_stem0=True compose the chain with a stem
    interception (s2d_net): images pass through RAW, the backbone `stem0`
    falls through to the inner interceptor (which consumes the raw frame),
    and the first block statically quantizes its f32 input via its own
    calibrated `#in` amax — the chain then runs int8 from there on.

    capture: a dict whose KEYS name module paths ("backbone", "neck",
    "backbone/stem1", ...); each named module's output (possibly a tracked
    int8 array) is stored under its key during the trace. Used by the
    attribution benchmark (tools/bench_int8_attrib.py) to build
    DCE-truncated prefix programs.
    """
    tracker = _Tracker()

    def _train_flag(args, kwargs):
        if "train" in kwargs:
            return kwargs["train"]
        return args[1] if len(args) >= 2 else False

    def interceptor(next_fun, args, kwargs, context):
        out = _impl(next_fun, args, kwargs, context)
        if capture is not None and context.method_name == "__call__":
            p = "/".join(str(q) for q in context.module.path)
            if p in capture:
                capture[p] = out
        return out

    def _impl(next_fun, args, kwargs, context):
        mod = context.module
        if context.method_name != "__call__":
            return next_fun(*args, **kwargs)
        if skip_stem0 and mod.path and mod.path[-1] == "stem0":
            # left to an inner stem interception (raw-frame s2d stem)
            return next_fun(*_dequant_args(args, tracker, dequant_dtype), **kwargs)
        if isinstance(mod, (_BLOCKS) + (ConvNormAct,)) and _train_flag(args, kwargs):
            # folded BN is inference-only
            return next_fun(*_dequant_args(args, tracker, dequant_dtype), **kwargs)
        if isinstance(mod, _BLOCKS):
            out = _block_int8(mod, args[0], amax, weight_scales, tracker)
            if out is not None:
                return out
            return next_fun(*_dequant_args(args, tracker, dequant_dtype), **kwargs)
        if isinstance(mod, ConvNormAct):
            parent_is_block = isinstance(mod.parent, _BLOCKS)
            if not parent_is_block:
                out = _standalone_cna_int8(mod, args[0], amax, weight_scales, tracker)
                if out is not None:
                    return out
            return next_fun(*_dequant_args(args, tracker, dequant_dtype), **kwargs)
        if isinstance(mod, (nn.Conv, _Shortcut, nn.GroupNorm, nn.BatchNorm)):
            return next_fun(*_dequant_args(args, tracker, dequant_dtype), **kwargs)
        return next_fun(*args, **kwargs)

    if quantize_input:
        s_img = _scale_of(amax["__input__#out"])
        x8 = tracker.set(_quantize_to(images_f32, s_img), s_img)
    else:
        x8 = images_f32  # raw frames: an inner stem interception consumes them
    with nn.intercept_methods(interceptor):
        return net.apply(variables, x8, train=False)
