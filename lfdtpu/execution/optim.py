# Optimizers for the jitted train step.
#
# The reference uses torch.optim.SGD(momentum, weight_decay)
# (`WIDERFACE_LFD_S.py:221-225`). Exact torch semantics, implemented as an
# optax-style (init, update) pair whose learning rate is a *traced argument*
# — one compiled train step serves the whole warmup/multistep schedule with
# no recompiles:
#
#   g      = grad + wd * param          (coupled weight decay)
#   buf    = momentum * buf + g
#   update = -lr * buf
#
# Any optax GradientTransformation can be used instead via OptaxOptimizer.

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class SGDState(NamedTuple):
    momentum_buf: Any


@dataclasses.dataclass(frozen=True)
class SGD:
    """torch-semantics SGD with runtime learning rate."""

    learning_rate: float = 0.1  # base lr; actual lr passed per step
    momentum: float = 0.0
    weight_decay: float = 0.0
    nesterov: bool = False

    def init(self, params):
        return SGDState(jax.tree.map(jnp.zeros_like, params))

    def update(self, grads, state, params, lr):
        wd = self.weight_decay
        mom = self.momentum

        def upd(g, p, buf):
            g = g + wd * p if wd else g
            buf = mom * buf + g if mom else g
            step = g + mom * buf if self.nesterov else buf
            return -lr * step, buf

        flat = jax.tree.map(upd, grads, params, state.momentum_buf)
        updates = jax.tree.map(lambda t: t[0], flat, is_leaf=lambda x: isinstance(x, tuple))
        bufs = jax.tree.map(lambda t: t[1], flat, is_leaf=lambda x: isinstance(x, tuple))
        return updates, SGDState(bufs)


@dataclasses.dataclass(frozen=True)
class OptaxOptimizer:
    """Wrap any optax transformation; lr scheduling must then live inside
    the transformation (the runtime `lr` argument is ignored)."""

    tx: optax.GradientTransformation
    learning_rate: float = 0.0

    def init(self, params):
        return self.tx.init(params)

    def update(self, grads, state, params, lr):
        return self.tx.update(grads, state, params)


def global_norm(tree):
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(x)) for x in jax.tree.leaves(tree))
    )


def clip_by_global_norm(grads, max_norm, enabled):
    """torch clip_grad_norm_ semantics, gated by a traced `enabled` flag
    (the reference clips only during the first `duration` epochs,
    `optimizer_hook.py:29-37`). Returns (clipped_grads, grad_norm)."""
    gnorm = global_norm(grads)
    scale = jnp.where(
        (gnorm > max_norm) & enabled, max_norm / (gnorm + 1e-6), 1.0
    )
    return jax.tree.map(lambda g: g * scale, grads), gnorm


def bias_param_labels(params):
    """Label each leaf 'bias' or 'other' following the reference's
    param-group split (`lfd/model/fcos.py:53-80`): conv biases form the bias
    group; norm affine params (scale/bias of BatchNorm/GroupNorm) stay in
    the main group."""

    def label(path, leaf):
        names = [str(getattr(p, "key", p)) for p in path]
        is_norm = any(("BatchNorm" in n) or ("GroupNorm" in n) or (n == "Norm_0") for n in names)
        if not is_norm and names and names[-1] == "bias":
            return "bias"
        return "other"

    return jax.tree_util.tree_map_with_path(label, params)


@dataclasses.dataclass(frozen=True)
class GroupedSGD:
    """SGD with a separate lr/weight-decay for the bias group
    (reference `param_groups_cfg` with bias_lr / bias_weight_decay).

    The runtime `lr` argument scales both groups proportionally
    (lr_bias = lr * bias_lr / learning_rate), preserving schedule shape.
    """

    learning_rate: float = 0.1
    momentum: float = 0.0
    weight_decay: float = 0.0
    bias_lr: float = None
    bias_weight_decay: float = None

    def _opts(self):
        main = SGD(self.learning_rate, self.momentum, self.weight_decay)
        bias = SGD(
            self.bias_lr if self.bias_lr is not None else self.learning_rate,
            self.momentum,
            self.bias_weight_decay if self.bias_weight_decay is not None else self.weight_decay,
        )
        return main, bias

    def init(self, params):
        main, _ = self._opts()
        return main.init(params)

    def update(self, grads, state, params, lr):
        main, bias = self._opts()
        labels = bias_param_labels(params)
        lr_scale_bias = (
            (self.bias_lr / self.learning_rate)
            if (self.bias_lr is not None and self.learning_rate)
            else 1.0
        )

        def upd(lbl, g, p, buf):
            o = bias if lbl == "bias" else main
            this_lr = lr * lr_scale_bias if lbl == "bias" else lr
            wd = o.weight_decay
            g = g + wd * p if wd else g
            buf = o.momentum * buf + g if o.momentum else g
            return -this_lr * buf, buf

        flat = jax.tree.map(upd, labels, grads, params, state.momentum_buf)
        updates = jax.tree.map(lambda t: t[0], flat, is_leaf=lambda x: isinstance(x, tuple))
        bufs = jax.tree.map(lambda t: t[1], flat, is_leaf=lambda x: isinstance(x, tuple))
        return updates, SGDState(bufs)
