# Shared building blocks for the model zoo (Flax linen, NHWC).
#
# The reference builds norm/activation layers from config dicts via an
# eval-based constructor (`lfd/model/backbone/lfd_resnet.py:10-18`). Here the
# same config-dict UX is kept but dispatched through explicit registries.
#
# TPU notes: all convs are NHWC + 'SAME' padding (identical output sizes to
# the reference's k3/p1 + k1/p0 torch convs at every stride) so XLA lowers
# them straight onto the MXU without layout transposes.

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

# torch BatchNorm2d defaults: momentum=0.1 (new = 0.9*old + 0.1*batch),
# eps=1e-5 -> flax momentum (EMA decay) = 0.9.
BN_MOMENTUM = 0.9
BN_EPS = 1e-5

kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
head_init = nn.initializers.normal(stddev=0.01)


def activation_from_cfg(cfg: Optional[dict]) -> Callable:
    if cfg is None:
        return lambda x: x
    t = cfg["type"]
    table = {
        "ReLU": jax.nn.relu,
        "ReLU6": jax.nn.relu6,
        "LeakyReLU": lambda x: jax.nn.leaky_relu(x, cfg.get("negative_slope", 0.01)),
        "SiLU": jax.nn.silu,
        "GELU": jax.nn.gelu,
        "Sigmoid": jax.nn.sigmoid,
        "Tanh": jnp.tanh,
    }
    if t not in table:
        raise ValueError(f"unsupported activation type: {t}")
    return table[t]


class Norm(nn.Module):
    """Norm layer from a reference-style cfg dict.

    cfg {'type': 'BatchNorm2d'} or {'type': 'GroupNorm', 'num_groups': G}.
    `train` toggles batch-stat collection like torch .train()/.eval()
    (norm_eval / frozen stages pass train=False).
    """

    cfg: dict

    @nn.compact
    def __call__(self, x, train: bool = False):
        t = self.cfg["type"]
        if t == "BatchNorm2d":
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPS,
                axis_name=None,
            )(x)
        if t == "GroupNorm":
            return nn.GroupNorm(num_groups=self.cfg["num_groups"], epsilon=1e-5)(x)
        raise ValueError(f"unsupported norm type: {t}")


def torch_padding(kernel_size):
    """Explicit symmetric padding k//2, matching torch Conv2d(padding=k//2).

    NOT 'SAME': at stride 2 SAME pads (0, 1) while torch pads (1, 1) with a
    floor output size — a one-pixel spatial shift that breaks weight-level
    parity with the reference (verified by tests/test_reference_parity.py).
    Output sizes are identical (ceil(in/s)) either way.
    """
    p = kernel_size // 2
    return [(p, p), (p, p)]


class ConvNormAct(nn.Module):
    """conv (+ norm) (+ act): the universal LFD building brick.

    Bias is present iff there is no norm, matching every conv in the
    reference (`lfd_resnet.py:42` et al.).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    kernel_init: Callable = kaiming_out

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=torch_padding(self.kernel_size),
            use_bias=self.norm_cfg is None,
            kernel_init=self.kernel_init,
            bias_init=nn.initializers.zeros,
        )(x)
        if self.norm_cfg is not None:
            x = Norm(self.norm_cfg)(x, train=train)
        if self.act_cfg is not None:
            x = activation_from_cfg(self.act_cfg)(x)
        return x


class Scale(nn.Module):
    """Learnable scalar multiplier (`lfd/model/head/lfd_head.py:9-16`)."""

    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        s = self.param("scale", nn.initializers.constant(self.init_value), ())
        return x * s
