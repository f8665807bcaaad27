# Space-to-depth stem transform for deployment engines (pure XLA).
#
# The first conv of every LFD backbone (3x3 stride-2, cin=3) is the worst
# op on TPU: XLA runs it at <2 TFLOP/s because a 3-channel contraction
# leaves the MXU's 128-wide reduction lanes ~empty (BENCH.md stem
# attribution: ~1.0 ms of a 6.9 ms 1080p engine). The classic TPU fix —
# used by the MLPerf ResNet submissions for conv1 — is to restate the conv
# on a space-to-depth view of the image:
#
#   x (H, W, 3)  -->  z (H/2, W/2, 12),  z[p, q, (a*2+b)*3+c] = x[2p+a, 2q+b, c]
#
# under which a 3x3/s2/pad1 conv becomes an EXACTLY equivalent 2x2/s1 conv
# with padding (1,0)x(1,0): input row 2i-1+dy of output row i lives in s2d
# block row p = i-1+u with (u,a) in {(0,1)->dy0, (1,0)->dy1, (1,1)->dy2}
# and (u=0,a=0) never used (weight 0). The contraction dim grows 27 -> 48
# and the spatial extent shrinks 4x, which is the shape XLA's conv tiling
# wants. Everything else folds in:
#
#   - the device normalize (x - mean)/std folds into the kernel
#     (k / std per input channel) and a per-output-channel bias, so the
#     engine feeds RAW uint8 frames and the separate normalize pass
#     disappears;
#   - inference BatchNorm is affine and folds into the same kernel/bias;
#   - zero-padding corrections: the reference pads the NORMALIZED image
#     with zeros, the folded conv pads the RAW image with zeros, which
#     differs by mean/std * k on exactly the padded taps. With stride 2,
#     pad 1 and even H/W only output row 0 (dy=0 taps) and output col 0
#     (dx=0 taps) ever touch padding, so three tiny `.at[].add` constants
#     (top edge, left edge, corner double-count) restore exactness.
#
# This is the XLA-native counterpart of ops/conv_pallas.stem_conv (which
# Mosaic cannot lower today — see that file's header); unlike the Pallas
# kernel it compiles on every backend. Replaces what TensorRT's conv
# algorithm selection does for the reference's first layer
# (`lfd/deployment/tensorrt/build_engine.py:74-152`).

from __future__ import annotations

import contextlib

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..models.layers import BN_EPS, ConvNormAct


def prepack_s2d_stem(variables, mean, std, bgr2rgb=False,
                     compute_dtype=jnp.bfloat16):
    """Fold normalize + stem0 conv + BN into s2d-conv constants.

    variables: engine variables (params + batch_stats); the backbone's
    first stem layer must be ConvNormAct(Co, k3, s2) with BatchNorm on a
    3-channel input (every zoo stem mode qualifies).
    mean/std: device-preprocess constants IN PIXEL UNITS (0..255), as
    exposed by make_device_preprocess.
    Returns (w2, bias, corr_top, corr_left, corr_corner) for
    s2d_stem_apply, or None when the stem is not this shape.
    """
    params = variables.get("params", {}).get("backbone", {}).get("stem0")
    stats = variables.get("batch_stats", {}).get("backbone", {}).get("stem0")
    if params is None or stats is None or "Norm_0" not in params:
        return None
    k = np.asarray(jax.device_get(params["Conv_0"]["kernel"]), np.float32)
    if k.ndim != 4 or k.shape[:3] != (3, 3, 3):
        return None
    bn = params["Norm_0"].get("BatchNorm_0")
    st = stats["Norm_0"].get("BatchNorm_0")
    if bn is None or st is None:
        return None
    g = np.asarray(jax.device_get(bn["scale"]), np.float32) / np.sqrt(
        np.asarray(jax.device_get(st["var"]), np.float32) + BN_EPS
    )
    d = (
        np.asarray(jax.device_get(bn["bias"]), np.float32)
        - np.asarray(jax.device_get(st["mean"]), np.float32) * g
    )
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    if bgr2rgb:
        # conv(x[..., ::-1], k) == conv(x, k[:, :, ::-1, :])
        k = k[:, :, ::-1, :]
        mean = mean[::-1]
        std = std[::-1]

    co = k.shape[3]
    kg = k * g  # BN scale folded, still in normalized-input units
    keff = kg / std[None, None, :, None]  # raw-pixel-input units
    w2 = np.zeros((2, 2, 12, co), np.float32)
    for u in (0, 1):
        for a in (0, 1):
            dy = 2 * u + a - 1
            if dy < 0:
                continue
            for v in (0, 1):
                for b in (0, 1):
                    dx = 2 * v + b - 1
                    if dx < 0:
                        continue
                    ch = (a * 2 + b) * 3
                    w2[u, v, ch:ch + 3, :] = keff[dy, dx]

    ms = mean / std
    # interior bias: BN shift minus the folded mean over ALL 9 taps
    bias = d - np.einsum("c,yxco->o", ms, kg)
    # padded taps contributed -ms*kg via `bias` but truly contribute 0:
    corr_top = np.einsum("c,xco->o", ms, kg[0])        # dy=0 row of taps
    corr_left = np.einsum("c,yco->o", ms, kg[:, 0])    # dx=0 col of taps
    corr_corner = -np.einsum("c,co->o", ms, kg[0, 0])  # (0,0) counted twice
    return (
        jnp.asarray(w2, compute_dtype),
        jnp.asarray(bias, jnp.float32),
        jnp.asarray(corr_top, jnp.float32),
        jnp.asarray(corr_left, jnp.float32),
        jnp.asarray(corr_corner, jnp.float32),
    )


def s2d_stem_apply(x, pack):
    """Raw frames (B, H, W, 3), H/W even -> stem0 output (B, H/2, W/2, Co).

    Space-to-depth + folded 2x2/s1 conv + bias + boundary corrections +
    ReLU; numerically equivalent to normalize -> ConvNormAct(stem0)."""
    w2, bias, c_top, c_left, c_corner = pack
    n, h, w, _ = x.shape
    z = x.reshape(n, h // 2, 2, w // 2, 2, 3)
    z = z.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 12)
    y = jax.lax.conv_general_dilated(
        z.astype(w2.dtype), w2, (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = y + bias
    y = y.at[:, 0, :, :].add(c_top)
    y = y.at[:, :, 0, :].add(c_left)
    y = y.at[:, 0, 0, :].add(c_corner)
    return jnp.maximum(y, 0.0).astype(w2.dtype)


@contextlib.contextmanager
def s2d_stem_interception(pack):
    """Context manager: the backbone's `stem0` ConvNormAct runs as the
    space-to-depth folded conv. The engine must feed raw uint8 frames (no
    separate preprocess) while this is active."""

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (
            context.method_name == "__call__"
            and isinstance(mod, ConvNormAct)
            and mod.path
            and mod.path[-1] == "stem0"
            and (mod.act_cfg or {}).get("type") == "ReLU"
        ):
            x = args[0]
            if (
                x.ndim == 4
                and x.shape[3] == 3
                and x.shape[1] % 2 == 0
                and x.shape[2] % 2 == 0
            ):
                return s2d_stem_apply(x, pack)
        return next_fun(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        yield
