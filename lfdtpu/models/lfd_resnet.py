# LFD-ResNet backbone (reference `lfd/model/backbone/lfd_resnet.py:218-509`)
# as an NHWC Flax module.
#
# Structure: stem ('fast' /2, 'faster' /4, 'fastest' /4) followed by stages of
# residual blocks; the first block of every stage is stride-2 with a 1x1
# projection shortcut. Outputs are tapped at arbitrary (stage, block)
# `out_indices`; output strides are stem_stride * 2^(stage+1)
# (`lfd_resnet.py:297-312`).

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax

from .blocks import BLOCK_TYPES
from .layers import ConvNormAct

MODE_TO_BODY_ARCHITECTURES = {
    "fast": (4, 2, 2, 1, 1),
    "faster": (2, 1, 1, 1, 1),
    "fastest": (2, 1, 1, 1, 1),
}
MODE_TO_BODY_CHANNELS = {
    "fast": (64, 64, 128, 256, 512),
    "faster": (64, 64, 128, 128, 256),
    "fastest": (32, 32, 64, 64, 128),
}


def resolve_body(body_mode, body_architecture, body_channels, out_indices):
    """Resolve the body plan and trim to the deepest tapped stage
    (`lfd_resnet.py:264-292`)."""
    if body_mode is not None:
        arch = list(MODE_TO_BODY_ARCHITECTURES[body_mode])
        chans = list(body_channels) if body_channels is not None else list(MODE_TO_BODY_CHANNELS[body_mode])
    else:
        assert body_architecture is not None and body_channels is not None
        arch = list(body_architecture)
        chans = list(body_channels)
    assert len(arch) == len(chans)
    out_indices = tuple(sorted(out_indices))
    for st, bl in out_indices:
        assert 0 <= st < len(arch) and 0 <= bl < arch[st]
    max_stage = max(st for st, _ in out_indices)
    return arch[: max_stage + 1], chans[: max_stage + 1], out_indices


def lfd_resnet_output_info(
    stem_mode="fast",
    body_mode="fast",
    body_architecture=None,
    body_channels=None,
    out_indices=((0, 3), (1, 1), (2, 1), (3, 0), (4, 0)),
):
    """(num_output_channels_list, num_output_strides_list) — computable
    without instantiating the model (`lfd_resnet.py:297-312`)."""
    arch, chans, out_indices = resolve_body(body_mode, body_architecture, body_channels, out_indices)
    stem_stride = 2 if stem_mode == "fast" else 4
    channels_list = [chans[st] for st, _ in out_indices]
    strides_list = [stem_stride * (2 ** (st + 1)) for st, _ in out_indices]
    return channels_list, strides_list


class LFDResNet(nn.Module):
    """Backbone. Forward returns a tuple of NHWC feature maps at out_indices.

    frozen_stages / norm_eval semantics: frozen parts run their norms in
    inference mode and their outputs are wrapped in stop_gradient — the JAX
    equivalent of requires_grad=False + .eval() (`lfd_resnet.py:475-486`).
    """

    block_mode: str = "fast"
    stem_mode: str = "fast"
    body_mode: Optional[str] = "fast"
    input_channels: int = 3
    stem_channels: int = 64
    body_architecture: Optional[Sequence[int]] = None
    body_channels: Optional[Sequence[int]] = None
    out_indices: Tuple[Tuple[int, int], ...] = ((0, 3), (1, 1), (2, 1), (3, 0), (4, 0))
    frozen_stages: int = -1
    act_cfg: dict = None
    norm_cfg: dict = None
    norm_eval: bool = False

    @property
    def num_output_channels_list(self):
        return lfd_resnet_output_info(
            self.stem_mode, self.body_mode, self.body_architecture, self.body_channels, self.out_indices
        )[0]

    @property
    def num_output_strides_list(self):
        return lfd_resnet_output_info(
            self.stem_mode, self.body_mode, self.body_architecture, self.body_channels, self.out_indices
        )[1]

    def setup(self):
        # setup-style (not @nn.compact) so stem_forward/body_forward are
        # separately applicable via `apply(..., method=...)` — the split
        # (two-program) deployment engine runs the stem and the body as
        # different XLA programs (deploy/pallas_net.py). Param names are
        # identical to the previous compact form.
        act_cfg = self.act_cfg or dict(type="ReLU")
        norm_cfg = self.norm_cfg if self.norm_cfg is not None else dict(type="BatchNorm2d")
        arch, chans, out_indices = resolve_body(
            self.body_mode, self.body_architecture, self.body_channels, self.out_indices
        )
        block_cls = BLOCK_TYPES[self.block_mode]

        # stem (`lfd_resnet.py:354-439`)
        if self.stem_mode == "fast":
            stems = [(self.stem_channels, 3, 2), (self.stem_channels, 1, 1)]
        elif self.stem_mode == "faster":
            stems = [(self.stem_channels, 3, 2), (self.stem_channels, 1, 1),
                     (self.stem_channels, 3, 2), (self.stem_channels, 1, 1)]
        elif self.stem_mode == "fastest":
            stems = [(self.stem_channels // 2, 3, 2), (self.stem_channels, 3, 2)]
        else:
            raise ValueError("Unsupported stem_mode!")
        self._stems = [
            ConvNormAct(ch, k, s, norm_cfg, act_cfg, name=f"stem{n}")
            for n, (ch, k, s) in enumerate(stems)
        ]
        self._stages = [
            [
                block_cls(
                    features=chans[i],
                    stride=2 if j == 0 else 1,
                    use_downsample=j == 0,
                    act_cfg=act_cfg,
                    norm_cfg=norm_cfg,
                    name=f"stage{i}_block{j}",
                )
                for j in range(num_blocks)
            ]
            for i, num_blocks in enumerate(arch)
        ]
        self._out_indices = out_indices

    def stem_forward(self, x, train: bool = False):
        bn_train = train and not self.norm_eval
        stem_train = bn_train and self.frozen_stages <= 0
        for m in self._stems:
            x = m(x, stem_train)
        if self.frozen_stages > 0:
            x = jax.lax.stop_gradient(x)
        return x

    def body_forward(self, x, train: bool = False):
        bn_train = train and not self.norm_eval
        outs = []
        for i, stage in enumerate(self._stages):
            stage_train = bn_train and i >= self.frozen_stages
            for j, block in enumerate(stage):
                x = block(x, stage_train)
                if i < self.frozen_stages:
                    # freeze: no gradient reaches this stage's params, even
                    # through tapped outputs
                    x = jax.lax.stop_gradient(x)
                if (i, j) in self._out_indices:
                    outs.append(x)
        return tuple(outs)

    def __call__(self, x, train: bool = False):
        return self.body_forward(self.stem_forward(x, train), train)
