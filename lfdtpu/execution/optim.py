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
