# Necks (reference `lfd/model/neck/{simple_neck,fpn,simple_fpn}.py`),
# NHWC Flax.

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import ConvNormAct, Norm, activation_from_cfg, kaiming_out

_RELU = dict(type="ReLU")
xavier_uniform = nn.initializers.xavier_uniform()


def _nearest_upsample_to(x, target_hw):
    """Nearest-neighbour upsample NHWC to an exact (h, w)."""
    n, h, w, c = x.shape
    th, tw = target_hw
    return jax.image.resize(x, (n, th, tw, c), method="nearest")


def fpn_output_strides(num_input_strides_list, num_outputs):
    """`fpn.py:104-109` / `simple_fpn.py:120-126`."""
    s = list(num_input_strides_list)
    if num_outputs <= len(s):
        return s[:num_outputs]
    for i in range(num_outputs - len(num_input_strides_list)):
        s.append(num_input_strides_list[-1] * 2 ** (i + 1))
    return s


class SimpleNeck(nn.Module):
    """Per-level independent 1x1 conv + norm + ReLU projection
    (`simple_neck.py:18-74`). No cross-level fusion."""

    num_neck_channels: int
    num_input_strides_list: Sequence[int] = ()
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None

    @property
    def num_output_strides_list(self):
        return list(self.num_input_strides_list)

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        norm_cfg = self.norm_cfg if self.norm_cfg is not None else dict(type="BatchNorm2d")
        act_cfg = self.act_cfg or _RELU
        outs = []
        for i, x in enumerate(inputs):
            outs.append(
                ConvNormAct(self.num_neck_channels, 1, 1, norm_cfg, act_cfg, name=f"neck{i}")(x, train)
            )
        return tuple(outs)


class _Lateral(nn.Module):
    features: int
    norm_on_lateral: bool
    relu_on_lateral: bool
    norm_cfg: Optional[dict]
    kernel_init: any = xavier_uniform

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, (1, 1), padding=[(0, 0), (0, 0)],
            use_bias=not self.norm_on_lateral,
            kernel_init=self.kernel_init,
        )(x)
        if self.norm_on_lateral:
            x = Norm(self.norm_cfg)(x, train=train)
        if self.relu_on_lateral:
            x = jax.nn.relu(x)
        return x


class FPN(nn.Module):
    """Classic top-down FPN (`fpn.py:17-152`): 1x1 laterals, nearest-upsample
    additive merge, 3x3 output convs, extra stride-2 conv/pool levels."""

    num_input_strides_list: Sequence[int]
    num_output_channels: int
    num_outputs: int
    extra_on_input: bool = False
    extra_type: str = "conv"
    norm_on_lateral: bool = False
    relu_on_lateral: bool = False
    relu_before_extra: bool = False
    norm_cfg: Optional[dict] = None
    lateral_init: any = xavier_uniform  # FPN uses xavier (`fpn.py:117-121`)

    @property
    def num_output_strides_list(self):
        return fpn_output_strides(self.num_input_strides_list, self.num_outputs)

    def _extra_level(self, x, i, train):
        if self.relu_before_extra:
            x = jax.nn.relu(x)
        if self.extra_type == "conv":
            return nn.Conv(
                self.num_output_channels, (3, 3), strides=(2, 2),
                padding=[(1, 1), (1, 1)],
                use_bias=True, kernel_init=self.lateral_init, name=f"fpn_out{i}",
            )(x)
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        n_in = len(inputs)
        laterals = [
            _Lateral(
                self.num_output_channels, self.norm_on_lateral, self.relu_on_lateral,
                self.norm_cfg, self.lateral_init, name=f"lateral{i}",
            )(x, train)
            for i, x in enumerate(inputs)
        ]
        for i in range(n_in - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _nearest_upsample_to(
                laterals[i], laterals[i - 1].shape[1:3]
            )
        outs = []
        for i in range(self.num_outputs):
            if i < n_in:
                outs.append(
                    nn.Conv(
                        self.num_output_channels, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=True, kernel_init=self.lateral_init, name=f"fpn_out{i}",
                    )(laterals[i])
                )
            elif i == n_in:
                src = inputs[-1] if self.extra_on_input else outs[-1]
                outs.append(self._extra_level(src, i, train))
            else:
                outs.append(self._extra_level(outs[-1], i, train))
        return tuple(outs)


class SimpleFPN(nn.Module):
    """FPN without 3x3 output convs on lateral levels (`simple_fpn.py:110-111`);
    optional neighbouring_mode merges each level with only its next neighbor,
    bottom-up (`simple_fpn.py:148-152`). Kaiming init (`simple_fpn.py:131-135`)."""

    num_input_strides_list: Sequence[int]
    num_output_channels: int
    num_outputs: int
    extra_on_input: bool = False
    extra_type: str = "conv"
    norm_on_lateral: bool = False
    relu_on_lateral: bool = False
    relu_before_extra: bool = False
    norm_cfg: Optional[dict] = None
    neighbouring_mode: bool = False

    @property
    def num_output_strides_list(self):
        return fpn_output_strides(self.num_input_strides_list, self.num_outputs)

    def _extra_level(self, x, i, train):
        if self.relu_before_extra:
            x = jax.nn.relu(x)
        if self.extra_type == "conv":
            return nn.Conv(
                self.num_output_channels, (3, 3), strides=(2, 2),
                padding=[(1, 1), (1, 1)],
                use_bias=True, kernel_init=kaiming_out, name=f"fpn_out{i}",
            )(x)
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        n_in = len(inputs)
        laterals = [
            _Lateral(
                self.num_output_channels, self.norm_on_lateral, self.relu_on_lateral,
                self.norm_cfg, kaiming_out, name=f"lateral{i}",
            )(x, train)
            for i, x in enumerate(inputs)
        ]
        if self.neighbouring_mode:
            for i in range(n_in - 1):
                laterals[i] = laterals[i] + _nearest_upsample_to(
                    laterals[i + 1], laterals[i].shape[1:3]
                )
        else:
            for i in range(n_in - 1, 0, -1):
                laterals[i - 1] = laterals[i - 1] + _nearest_upsample_to(
                    laterals[i], laterals[i - 1].shape[1:3]
                )
        outs = []
        for i in range(self.num_outputs):
            if i < n_in:
                outs.append(laterals[i])
            elif i == n_in:
                src = inputs[-1] if self.extra_on_input else outs[-1]
                outs.append(self._extra_level(src, i, train))
            else:
                outs.append(self._extra_level(outs[-1], i, train))
        return tuple(outs)
