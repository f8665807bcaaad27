# LFD-ResNet residual block family (reference `lfd/model/backbone/
# lfd_resnet.py:21-215`), as NHWC Flax modules.
#
#   FastBlock    : 3x3 -> 1x1 -> 3x3 + residual  (norm+act between, act after add)
#   FasterBlock  : 3x3 -> 3x3 + residual
#   FastestBlock : 3x3 (C/2) -> 3x3 (C) + residual
#
# A stride-2 first block uses a 1x1/stride-2 projection shortcut
# (`lfd_resnet.py:452-473`).

from __future__ import annotations

from typing import Optional

import flax.linen as nn

from .layers import ConvNormAct, Norm, activation_from_cfg, kaiming_out


class _Shortcut(nn.Module):
    features: int
    stride: int
    norm_cfg: Optional[dict]

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            kernel_size=(1, 1),
            strides=(self.stride, self.stride),
            padding=[(0, 0), (0, 0)],
            use_bias=self.norm_cfg is None,
            kernel_init=kaiming_out,
        )(x)
        if self.norm_cfg is not None:
            x = Norm(self.norm_cfg)(x, train=train)
        return x


class FastBlock(nn.Module):
    features: int
    stride: int = 1
    use_downsample: bool = False
    act_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = activation_from_cfg(self.act_cfg or dict(type="ReLU"))
        identity = x
        out = ConvNormAct(self.features, 3, self.stride, self.norm_cfg, self.act_cfg or dict(type="ReLU"))(x, train)
        out = ConvNormAct(self.features, 1, 1, self.norm_cfg, self.act_cfg or dict(type="ReLU"))(out, train)
        out = ConvNormAct(self.features, 3, 1, self.norm_cfg, None)(out, train)
        if self.use_downsample:
            identity = _Shortcut(self.features, self.stride, self.norm_cfg)(x, train)
        return act(out + identity)


class FasterBlock(nn.Module):
    features: int
    stride: int = 1
    use_downsample: bool = False
    act_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = activation_from_cfg(self.act_cfg or dict(type="ReLU"))
        identity = x
        out = ConvNormAct(self.features, 3, self.stride, self.norm_cfg, self.act_cfg or dict(type="ReLU"))(x, train)
        out = ConvNormAct(self.features, 3, 1, self.norm_cfg, None)(out, train)
        if self.use_downsample:
            identity = _Shortcut(self.features, self.stride, self.norm_cfg)(x, train)
        return act(out + identity)


class FastestBlock(nn.Module):
    features: int
    stride: int = 1
    use_downsample: bool = False
    act_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = activation_from_cfg(self.act_cfg or dict(type="ReLU"))
        identity = x
        out = ConvNormAct(self.features // 2, 3, self.stride, self.norm_cfg, self.act_cfg or dict(type="ReLU"))(x, train)
        out = ConvNormAct(self.features, 3, 1, self.norm_cfg, None)(out, train)
        if self.use_downsample:
            identity = _Shortcut(self.features, self.stride, self.norm_cfg)(x, train)
        return act(out + identity)


BLOCK_TYPES = {
    "fast": FastBlock,
    "faster": FasterBlock,
    "fastest": FastestBlock,
}
