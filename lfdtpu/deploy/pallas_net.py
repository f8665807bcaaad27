# Pallas-kernel inference path: route the convs where XLA's native conv is
# far from the roofline through the hand-written TPU kernels in
# `lfdtpu/ops/conv_pallas.py`.
#
# Same integration mechanism as the int8 path (`int8_net.py`): a flax
# method interceptor swaps eligible nn.Conv calls at apply-time — no
# parallel module tree; kernels are PRE-PACKED at engine build (keyed by
# module path) and passed as jit arguments, so there is zero per-call
# weight work.
#
# Eligible today: 3x3 stride-1 SAME/torch-pad convs with cin == cout == 64
# and bf16 activations — the backbone stage convs that XLA runs at the 25%
# MXU ceiling (measured ~22 TFLOP/s vs ~84 for the pair kernel; see
# BENCH.md and tools/kernel_lab.py).

from __future__ import annotations

import contextlib

import flax.linen as nn
import jax
import jax.numpy as jnp

import numpy as np

from ..models.blocks import FasterBlock
from ..models.layers import BN_EPS, ConvNormAct
from ..ops.conv_pallas import (
    pack_pair_weights,
    pack_stem,
    pair_conv3x3,
    stem_conv,
)


def _is_stride1(mod):
    s = mod.strides if mod.strides is not None else 1
    if isinstance(s, int):
        s = (s, s)
    return tuple(s) == (1, 1)


def _is_k3_same(mod):
    k = mod.kernel_size
    if isinstance(k, int):
        k = (k, k)
    if tuple(k) != (3, 3):
        return False
    p = mod.padding
    if isinstance(p, str):
        return p.upper() == "SAME"
    # torch_padding(3) == [(1, 1), (1, 1)] == SAME at stride 1
    return tuple(map(tuple, p)) == ((1, 1), (1, 1))


def eligible_conv(mod, x):
    """True if this nn.Conv call can run as a pallas pair conv."""
    kernel = mod.variables["params"]["kernel"]
    return (
        kernel.shape == (3, 3, 64, 64)
        and mod.feature_group_count == 1
        and _is_stride1(mod)
        and _is_k3_same(mod)
        and x.dtype == jnp.bfloat16
        and x.ndim == 4
        and x.shape[3] == 64
        and x.shape[1] % 8 == 0
        and x.shape[2] % 2 == 0
        and x.shape[1] >= 16
        and x.shape[2] >= 4
    )


def prepack_pair_weights(variables):
    """Pack every eligible (3,3,64,64) conv kernel into pair-matmul form
    ONCE at engine build. Returns {module_path: (768,128) bf16}; paths
    match the interceptor's '/'.join(module.path) keys."""
    packs = {}

    def walk(tree, path):
        for k, v in tree.items():
            if isinstance(v, dict):
                if "kernel" in v and getattr(v["kernel"], "shape", None) == (3, 3, 64, 64):
                    packs["/".join(path + (k,))] = jnp.asarray(
                        pack_pair_weights(jax.device_get(v["kernel"])),
                        jnp.bfloat16,
                    )
                else:
                    walk(v, path + (k,))

    walk(variables["params"], ())
    return packs


_IDENTITY_SB = None


def _identity_sb():
    global _IDENTITY_SB
    if _IDENTITY_SB is None:
        import numpy as np

        _IDENTITY_SB = jnp.asarray(
            np.stack([np.ones(128, np.float32), np.zeros(128, np.float32)])
        )
    return _IDENTITY_SB


def _pallas_conv(mod, x, w_pack):
    bias = mod.variables["params"].get("bias")
    sb = _identity_sb()
    if bias is not None:
        sb = jnp.stack([jnp.ones(128, jnp.float32),
                        jnp.tile(bias.astype(jnp.float32), 2)])

    def one(img):
        return pair_conv3x3(img, w_pack, sb, relu=False, tile_h=8)

    return jax.vmap(one)(x)


def _folded_bn_sb(block_params, block_stats, cna_name):
    """Folded inference-mode BatchNorm as a (2,128) pair-form scale/bias."""
    bn = block_params[cna_name]["Norm_0"]["BatchNorm_0"]
    st = block_stats[cna_name]["Norm_0"]["BatchNorm_0"]
    scale = bn["scale"].astype(jnp.float32) * jax.lax.rsqrt(
        st["var"].astype(jnp.float32) + BN_EPS
    )
    bias = bn["bias"].astype(jnp.float32) - st["mean"].astype(jnp.float32) * scale
    return jnp.stack([jnp.tile(scale, 2), jnp.tile(bias, 2)])


def _block_train_flag(args, kwargs):
    if "train" in kwargs:
        return kwargs["train"]
    if len(args) >= 2:
        return args[1]
    return False


def eligible_faster_block(mod, x):
    """A stride-1 64ch FasterBlock with BatchNorm+ReLU on bf16 input can run
    as two fused pallas pair convs (BN/ReLU/residual in the epilogues)."""
    act = mod.act_cfg or dict(type="ReLU")
    norm = mod.norm_cfg if mod.norm_cfg is not None else dict(type="BatchNorm2d")
    return (
        mod.stride == 1
        and not mod.use_downsample
        and mod.features == 64
        and act.get("type") == "ReLU"
        and norm.get("type") == "BatchNorm2d"
        and x.dtype == jnp.bfloat16
        and x.ndim == 4
        and x.shape[3] == 64
        and x.shape[1] % 8 == 0
        and x.shape[2] % 2 == 0
        and x.shape[1] >= 16
        and x.shape[2] >= 4
        and "batch_stats" in mod.variables
    )


def _pallas_faster_block(mod, x, path, weight_packs):
    """relu(bn(conv3x3(relu(bn(conv3x3(x)))))) + x as two fused kernels."""
    params = mod.variables["params"]
    stats = mod.variables["batch_stats"]
    w0 = weight_packs[path + "/ConvNormAct_0/Conv_0"]
    w1 = weight_packs[path + "/ConvNormAct_1/Conv_0"]
    sb0 = _folded_bn_sb(params, stats, "ConvNormAct_0")
    sb1 = _folded_bn_sb(params, stats, "ConvNormAct_1")

    def one(img):
        y = pair_conv3x3(img, w0, sb0, relu=True, tile_h=8)
        return pair_conv3x3(y, w1, sb1, residual=img, relu=True, tile_h=8)

    return jax.vmap(one)(x)


def prepack_stem(variables, mean, std, bgr2rgb=False):
    """Fold normalize + stem0 conv + BN into stem-kernel constants.

    variables: the engine's run variables (params + batch_stats); the
    backbone's first stem layer must be ConvNormAct(64, k3, s2) with
    BatchNorm + ReLU on a 3-channel input ('fast'/'faster' stem modes,
    reference `lfd_resnet.py:354-400`).
    mean/std: device-preprocess constants IN PIXEL UNITS (0..255) — the
    kernel consumes RAW uint8 frames and normalizes in-register, so the
    engine skips its separate preprocess pass.
    Returns (w, affine, out_sb) for ops.conv_pallas.stem_conv, or None when
    the net's stem is not this shape.
    """
    params = variables.get("params", {}).get("backbone", {}).get("stem0")
    stats = variables.get("batch_stats", {}).get("backbone", {}).get("stem0")
    if params is None or stats is None or "Norm_0" not in params:
        return None
    k = np.asarray(jax.device_get(params["Conv_0"]["kernel"]), np.float32)
    if k.shape != (3, 3, 3, 64):
        return None
    bn = params["Norm_0"]["BatchNorm_0"]
    st = stats["Norm_0"]["BatchNorm_0"]
    scale = np.asarray(jax.device_get(bn["scale"]), np.float32) / np.sqrt(
        np.asarray(jax.device_get(st["var"]), np.float32) + BN_EPS
    )
    bias = (
        np.asarray(jax.device_get(bn["bias"]), np.float32)
        - np.asarray(jax.device_get(st["mean"]), np.float32) * scale
    )
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    if bgr2rgb:
        # conv(x[..., ::-1], k) == conv(x, k[:, :, ::-1, :]): fold the
        # channel flip into the packed weights + normalize constants
        k = k[:, :, ::-1, :]
        mean = mean[::-1]
        std = std[::-1]
    return pack_stem(k, mean, std, scale=scale, bias=bias)


@contextlib.contextmanager
def pallas_stem_interception(stem_pack, interpret=False):
    """Context manager: the backbone's `stem0` ConvNormAct runs as the
    fused Pallas stem kernel (normalize + 3x3/s2 conv 3->64 + folded BN +
    ReLU in ONE kernel consuming the raw uint8 frame). The engine must
    feed raw uint8 frames (no separate preprocess) when this is active."""
    w, affine, out_sb = stem_pack

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (
            context.method_name == "__call__"
            and isinstance(mod, ConvNormAct)
            and mod.path
            and mod.path[-1] == "stem0"
        ):
            x = args[0]
            if (
                x.ndim == 4
                and x.shape[3] == 3
                and x.shape[1] % 8 == 0
                and x.shape[2] % 4 == 0
            ):
                def one(img):
                    return stem_conv(img, w, affine, out_sb, relu=True)

                if interpret:
                    from jax.experimental.pallas import tpu as pltpu

                    with pltpu.force_tpu_interpret_mode():
                        return jax.vmap(one)(x)
                return jax.vmap(one)(x)
        return next_fun(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        yield


@contextlib.contextmanager
def pallas_conv_interception(weight_packs, per_conv=False):
    """Context manager: inside it, eligible FasterBlocks in
    detector.net.apply run as fused pallas pair-conv kernels (BN + ReLU +
    residual folded into the kernel epilogues, so consecutive blocks chain
    pallas->pallas with no XLA relayout/fusion boundary between them).

    weight_packs: {module_path: (768,128) bf16} from prepack_pair_weights.
    Blocks without packs (or ineligible shapes) fall through to XLA.

    per_conv: additionally swap ELIGIBLE STANDALONE convs (outside fused
    blocks). Off by default: measured end-to-end, isolated pallas convs
    lose more to XLA fusion/layout boundaries than the kernel gains
    (11.4 vs 6.9 ms at 1080p-L) — only the fused block path wins.
    """

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if context.method_name != "__call__":
            return next_fun(*args, **kwargs)
        if isinstance(mod, FasterBlock):
            if _block_train_flag(args, kwargs):
                return next_fun(*args, **kwargs)
            x = args[0]
            path = "/".join(str(p) for p in mod.path)
            if (
                eligible_faster_block(mod, x)
                and path + "/ConvNormAct_0/Conv_0" in weight_packs
                and path + "/ConvNormAct_1/Conv_0" in weight_packs
            ):
                return _pallas_faster_block(mod, x, path, weight_packs)
            return next_fun(*args, **kwargs)
        if per_conv and isinstance(mod, nn.Conv):
            path = "/".join(str(p) for p in mod.path)
            if path in weight_packs and eligible_conv(mod, args[0]):
                return _pallas_conv(mod, args[0], weight_packs[path])
        return next_fun(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        yield
