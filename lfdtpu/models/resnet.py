# mmdet-style ResNet backbone (reference `lfd/model/backbone/resnet.py`),
# NHWC Flax. Supports depths 18/34/50/101/152, pytorch/caffe stride styles,
# deep_stem, per-(stage, block) output taps (stage index 1-based like the
# reference, `resnet.py:257`), frozen stages and norm_eval.

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax

from .layers import ConvNormAct, Norm, activation_from_cfg, kaiming_out

ARCH_SETTINGS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}

_RELU = dict(type="ReLU")


def _norm_cfg_std(norm_cfg):
    # reference uses {'type': 'BN'} / {'type': 'GN'} here (`resnet.py:272`)
    t = norm_cfg.get("type", "BN")
    if t in ("BN", "BatchNorm2d"):
        return dict(type="BatchNorm2d")
    if t in ("GN", "GroupNorm"):
        return dict(type="GroupNorm", num_groups=norm_cfg["num_groups"])
    raise ValueError(t)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    norm_cfg: dict = None
    use_downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        ncfg = self.norm_cfg
        identity = x
        out = ConvNormAct(self.planes, 3, self.stride, ncfg, _RELU)(x, train)
        out = ConvNormAct(self.planes, 3, 1, ncfg, None)(out, train)
        if self.use_downsample:
            identity = ConvNormAct(self.planes, 1, self.stride, ncfg, None)(x, train)
        return jax.nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    norm_cfg: dict = None
    style: str = "pytorch"
    use_downsample: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        ncfg = self.norm_cfg
        # pytorch style: stride on the 3x3; caffe: on the first 1x1
        # (`resnet.py:92-115`)
        s1, s2 = (1, self.stride) if self.style == "pytorch" else (self.stride, 1)
        identity = x
        out = ConvNormAct(self.planes, 1, s1, ncfg, _RELU)(x, train)
        out = ConvNormAct(self.planes, 3, s2, ncfg, _RELU)(out, train)
        out = ConvNormAct(self.planes * self.expansion, 1, 1, ncfg, None)(out, train)
        if self.use_downsample:
            identity = ConvNormAct(self.planes * self.expansion, 1, self.stride, ncfg, None)(x, train)
        return jax.nn.relu(out + identity)


def resnet_output_info(depth, base_channels=64, out_indices=((1, 1), (2, 1), (3, 1), (4, 1))):
    """(channels_list, strides_list) for the tapped outputs
    (`resnet.py:328-335`)."""
    kind, _ = ARCH_SETTINGS[depth]
    expansion = 1 if kind == "basic" else 4
    out_indices = sorted(out_indices)
    channels = [base_channels * (2 ** (st - 1)) * expansion for st, _ in out_indices]
    strides = [2 ** (st + 1) for st, _ in out_indices]
    return channels, strides


class ResNet(nn.Module):
    depth: int = 50
    in_channels: int = 3
    base_channels: int = 64
    strides: Tuple[int, ...] = (1, 2, 2, 2)
    out_indices: Tuple[Tuple[int, int], ...] = ((1, 1), (2, 1), (3, 1), (4, 1))
    style: str = "pytorch"
    deep_stem: bool = False
    frozen_stages: int = -1
    norm_cfg: dict = None
    norm_eval: bool = True

    @property
    def num_output_channels_list(self):
        return resnet_output_info(self.depth, self.base_channels, self.out_indices)[0]

    @property
    def num_output_strides_list(self):
        return resnet_output_info(self.depth, self.base_channels, self.out_indices)[1]

    @nn.compact
    def __call__(self, x, train: bool = False):
        ncfg = _norm_cfg_std(self.norm_cfg or dict(type="BN"))
        kind, stage_blocks = ARCH_SETTINGS[self.depth]
        block_cls = BasicBlock if kind == "basic" else Bottleneck
        expansion = 1 if kind == "basic" else 4
        out_indices = sorted(self.out_indices)
        num_stages = max(st for st, _ in out_indices)
        bn_train = train and not self.norm_eval

        stem_train = bn_train and self.frozen_stages < 0
        if self.deep_stem:
            c2 = self.base_channels // 2
            x = ConvNormAct(c2, 3, 2, ncfg, _RELU, name="stem0")(x, stem_train)
            x = ConvNormAct(c2, 3, 1, ncfg, _RELU, name="stem1")(x, stem_train)
            x = ConvNormAct(self.base_channels, 3, 1, ncfg, _RELU, name="stem2")(x, stem_train)
        else:
            x = ConvNormAct(self.base_channels, 7, 2, ncfg, _RELU, name="stem0")(x, stem_train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        outs = []
        planes = self.base_channels
        for i in range(num_stages):
            stage_idx = i + 1  # 1-based like the reference
            stage_train = bn_train and stage_idx > self.frozen_stages
            for j in range(stage_blocks[i]):
                stride = self.strides[i] if j == 0 else 1
                in_feats = x.shape[-1]
                needs_ds = j == 0 and (stride != 1 or in_feats != planes * expansion)
                kwargs = dict(
                    planes=planes,
                    stride=stride,
                    norm_cfg=ncfg,
                    use_downsample=needs_ds,
                    name=f"stage{stage_idx}_block{j}",
                )
                if kind == "bottleneck":
                    kwargs["style"] = self.style
                x = block_cls(**kwargs)(x, stage_train)
                if stage_idx <= self.frozen_stages:
                    x = jax.lax.stop_gradient(x)
                if (stage_idx, j) in out_indices:
                    outs.append(x)
            planes *= 2
        return tuple(outs)
