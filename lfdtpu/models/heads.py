# Detection heads (reference `lfd/model/head/{lfd_head,fcos_head}.py`),
# NHWC Flax.

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import ConvNormAct, Scale, head_init

_IOU_LOSSES = ("IoULoss", "GIoULoss", "DIoULoss", "CIoULoss")
_RELU = dict(type="ReLU")


class _HeadPath(nn.Module):
    """A stack of conv+norm+act layers, optionally ending in a 1x1 final conv."""

    num_layers: int
    channels: int
    kernel_size: int
    norm_cfg: Optional[dict]
    act_cfg: dict
    final_features: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_layers):
            x = ConvNormAct(
                self.channels, self.kernel_size, 1, self.norm_cfg, self.act_cfg,
                kernel_init=head_init, name=f"conv{i}",
            )(x, train)
        if self.final_features is not None:
            x = nn.Conv(
                self.final_features, (1, 1), padding=[(0, 0), (0, 0)],
                use_bias=True, kernel_init=head_init, name="final",
            )(x)
        return x


class LFDHead(nn.Module):
    """Per-level dual-branch head (`lfd_head.py:30-185`).

    merge_path_flag: a shared conv trunk feeds two 1x1 final layers.
    share_head_flag: one set of parameters reused on every level (incl. norm
    state, exactly like the reference's module-object reuse, `:74-77`).
    IoU-family regression adds a learnable per-level Scale (`:64-65,179-180`).

    Returns (classification_outputs, regression_outputs): lists of NHWC maps;
    classification has C channels (C+1 for CrossEntropyLoss).
    """

    num_classes: int
    num_heads: int
    num_head_channels: int = 128
    num_conv_layers: int = 2
    conv_kernel_size: int = 1
    act_cfg: dict = None
    norm_cfg: Optional[dict] = None
    classification_loss_type: str = "FocalLoss"
    regression_loss_type: str = "IoULoss"
    share_head_flag: bool = False
    merge_path_flag: bool = False

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == self.num_heads
        act_cfg = self.act_cfg or _RELU
        cls_channels = (
            self.num_classes + 1
            if self.classification_loss_type == "CrossEntropyLoss"
            else self.num_classes
        )
        with_scale = self.regression_loss_type in _IOU_LOSSES

        def make_paths(idx):
            name = "shared" if self.share_head_flag else f"head{idx}"
            if self.merge_path_flag:
                merge = _HeadPath(
                    self.num_conv_layers, self.num_head_channels, self.conv_kernel_size,
                    self.norm_cfg, act_cfg, name=f"{name}_merge",
                )
                cls_path = _HeadPath(0, self.num_head_channels, 1, None, act_cfg,
                                     final_features=cls_channels, name=f"{name}_cls")
                reg_path = _HeadPath(0, self.num_head_channels, 1, None, act_cfg,
                                     final_features=4, name=f"{name}_reg")
            else:
                merge = None
                cls_path = _HeadPath(
                    self.num_conv_layers, self.num_head_channels, self.conv_kernel_size,
                    self.norm_cfg, act_cfg, final_features=cls_channels, name=f"{name}_cls",
                )
                reg_path = _HeadPath(
                    self.num_conv_layers, self.num_head_channels, self.conv_kernel_size,
                    self.norm_cfg, act_cfg, final_features=4, name=f"{name}_reg",
                )
            return merge, cls_path, reg_path

        if self.share_head_flag:
            shared = make_paths(0)

        cls_outs, reg_outs = [], []
        for i, x in enumerate(inputs):
            merge, cls_path, reg_path = shared if self.share_head_flag else make_paths(i)
            if merge is not None:
                x = merge(x, train)
            cls_out = cls_path(x, train)
            reg_out = reg_path(x, train)
            if with_scale:
                reg_out = Scale(1.0, name=f"scale{i}")(reg_out)
            cls_outs.append(cls_out)
            reg_outs.append(reg_out)
        return cls_outs, reg_outs


class LFDHeadV1(nn.Module):
    """Older variant (`lfd_head.py:188-344`): shared conv trunks across
    levels with separate per-level 1x1 final classifiers/regressors."""

    num_classes: int
    num_heads: int
    num_head_channels: int = 128
    num_conv_layers: int = 2
    conv_kernel_size: int = 3
    act_cfg: dict = None
    norm_cfg: Optional[dict] = None
    classification_loss_type: str = "FocalLoss"
    regression_loss_type: str = "IoULoss"

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == self.num_heads
        act_cfg = self.act_cfg or _RELU
        cls_channels = (
            self.num_classes + 1
            if self.classification_loss_type == "CrossEntropyLoss"
            else self.num_classes
        )
        with_scale = self.regression_loss_type in _IOU_LOSSES
        cls_trunk = _HeadPath(
            self.num_conv_layers, self.num_head_channels, self.conv_kernel_size,
            self.norm_cfg, act_cfg, name="cls_trunk",
        )
        reg_trunk = _HeadPath(
            self.num_conv_layers, self.num_head_channels, self.conv_kernel_size,
            self.norm_cfg, act_cfg, name="reg_trunk",
        )
        cls_outs, reg_outs = [], []
        for i, x in enumerate(inputs):
            c = cls_trunk(x, train)
            r = reg_trunk(x, train)
            c = nn.Conv(cls_channels, (1, 1), use_bias=True, kernel_init=head_init,
                        name=f"cls_final{i}")(c)
            r = nn.Conv(4, (1, 1), use_bias=True, kernel_init=head_init,
                        name=f"reg_final{i}")(r)
            if with_scale:
                r = Scale(1.0, name=f"scale{i}")(r)
            cls_outs.append(c)
            reg_outs.append(r)
        return cls_outs, reg_outs


class FCOSHead(nn.Module):
    """FCOS head (`fcos_head.py:21-155`): two 3x3 conv towers, centerness
    branch off the classification tower, per-level Scale then exp applied to
    regression inside the head. Classification final bias initialized to
    -log((1-p)/p), p=0.01 (`:83-90,116-119`).

    Returns (cls_outputs, reg_outputs, centerness_outputs).
    """

    num_classes: int
    num_heads: int = 5
    num_head_channels: int = 256
    num_layers: int = 4
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == self.num_heads
        prior_bias = float(-np.log((1 - 0.01) / 0.01))
        cls_tower = _HeadPath(self.num_layers, self.num_head_channels, 3,
                              self.norm_cfg, _RELU, name="cls_tower")
        reg_tower = _HeadPath(self.num_layers, self.num_head_channels, 3,
                              self.norm_cfg, _RELU, name="reg_tower")
        cls_final = nn.Conv(self.num_classes, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True,
                            kernel_init=head_init,
                            bias_init=nn.initializers.constant(prior_bias),
                            name="classification")
        ctr_final = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True,
                            kernel_init=head_init, name="centerness")
        reg_final = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True,
                            kernel_init=head_init, name="regression")

        cls_outs, reg_outs, ctr_outs = [], [], []
        for i, x in enumerate(inputs):
            c = cls_tower(x, train)
            r = reg_tower(x, train)
            cls_outs.append(cls_final(c))
            ctr_outs.append(ctr_final(c))
            reg = Scale(1.0, name=f"scale{i}")(reg_final(r))
            # exp applied inside the head (`fcos_head.py:147-148`); keep f32;
            # clamped so untrained/zero-weight rows cannot reach inf (inf
            # box areas turn IoU-loss unions into NaN that weights can't mask)
            reg_outs.append(jnp.exp(jnp.minimum(reg.astype(jnp.float32), 30.0)))
        return cls_outs, reg_outs, ctr_outs
