# Detection losses (pure jnp, shape-static, jit/grad friendly).
#
# Numerics follow the reference exactly:
#   - sigmoid focal loss reproduces the stable log-sigmoid CUDA form of
#     `losses/build/sigmoid_focal_loss/src/cuda/sigmoid_focal_loss_cuda.cu:24-97`
#     including its FLT_MIN clamp, with a custom VJP matching the handwritten
#     backward kernel (`:99-171`). On TPU the whole thing fuses into a single
#     XLA elementwise kernel — no native extension needed.
#   - weight / avg_factor semantics mirror `lfd/model/losses/utils.py:8-100`.
#
# Unlike the reference, nothing here gathers dynamic index subsets: callers
# pass full-size tensors plus element weights/masks; `sum/avg_factor` over a
# masked tensor is numerically identical to gather-then-mean.

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_FLT_MIN = 1.1754943508222875e-38
_LOG_FLT_MIN = math.log(_FLT_MIN)


def reduce_loss(loss, reduction):
    if reduction == "none":
        return loss
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    raise ValueError(f"invalid reduction: {reduction}")


def weight_reduce_loss(loss, weight=None, reduction="mean", avg_factor=None):
    """`lfd/model/losses/utils.py:28-54` semantics."""
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        return reduce_loss(loss, reduction)
    if reduction == "mean":
        return jnp.sum(loss) / avg_factor
    if reduction == "none":
        return loss
    raise ValueError('avg_factor can not be used with reduction="sum"')


# ---------------------------------------------------------------------------
# Sigmoid focal loss (stable form + custom VJP)
# ---------------------------------------------------------------------------

def _log_sigmoid_neg(x):
    """log(sigmoid(-x)) = log(1 - sigmoid(x)), stable (cuda :49-52)."""
    ge = (x >= 0).astype(x.dtype)
    return -x * ge - jnp.log1p(jnp.exp(x - 2.0 * x * ge))


@jax.custom_vjp
def _sigmoid_focal_loss_elementwise(logits, targets, gamma, alpha):
    """Per-element focal loss (N, C); integer targets, bg = C.

    Forward matches SigmoidFocalLossForward (cuda :24-59): for class column d
    and target t, c1 = (t == d) positive term, c2 = (t >= 0 && t != d)
    negative term.
    """
    num_classes = logits.shape[-1]
    d = jnp.arange(num_classes, dtype=targets.dtype)[None, :]
    t = targets[:, None]
    c1 = (t == d).astype(logits.dtype)
    c2 = ((t >= 0) & (t != d)).astype(logits.dtype)

    p = jax.nn.sigmoid(logits)
    # (1-p)^g * log(max(p, FLT_MIN))
    term1 = jnp.power(1.0 - p, gamma) * jnp.maximum(jax.nn.log_sigmoid(logits), _LOG_FLT_MIN)
    # p^g * log(1-p) in shifted-exp stable form
    term2 = jnp.power(p, gamma) * _log_sigmoid_neg(logits)
    return -c1 * term1 * alpha - c2 * term2 * (1.0 - alpha)


def _focal_fwd(logits, targets, gamma, alpha):
    return _sigmoid_focal_loss_elementwise(logits, targets, gamma, alpha), (
        logits,
        targets,
        gamma,
        alpha,
    )


def _focal_bwd(res, g):
    """Matches SigmoidFocalLossBackward (cuda :99-143)."""
    logits, targets, gamma, alpha = res
    num_classes = logits.shape[-1]
    d = jnp.arange(num_classes, dtype=targets.dtype)[None, :]
    t = targets[:, None]
    c1 = (t == d).astype(logits.dtype)
    c2 = ((t >= 0) & (t != d)).astype(logits.dtype)

    p = jax.nn.sigmoid(logits)
    logp = jnp.maximum(jax.nn.log_sigmoid(logits), _LOG_FLT_MIN)
    d1 = jnp.power(1.0 - p, gamma) * (1.0 - p - p * gamma * logp)
    d2 = jnp.power(p, gamma) * (_log_sigmoid_neg(logits) * (1.0 - p) * gamma - p)
    d_logits = (-c1 * d1 * alpha - c2 * d2 * (1.0 - alpha)) * g
    return d_logits, None, None, None


_sigmoid_focal_loss_elementwise.defvjp(_focal_fwd, _focal_bwd)


def sigmoid_focal_loss(
    pred,
    target,
    weight=None,
    gamma=2.0,
    alpha=0.25,
    reduction="mean",
    avg_factor=None,
):
    """`lfd/model/losses/focal_loss.py:40-54`: per-element FL then reduce.

    pred: (N, C) logits; target: (N,) int labels with background == C.
    weight, if given, is per-row and broadcast over classes (`:51-52`).
    """
    loss = _sigmoid_focal_loss_elementwise(pred, target, float(gamma), float(alpha))
    if weight is not None:
        weight = weight.reshape(-1, 1)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


# ---------------------------------------------------------------------------
# Generalized focal losses
# ---------------------------------------------------------------------------

def _bce_with_logits(pred, target):
    # Stable binary cross entropy with logits.
    return jnp.clip(pred, 0, None) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))


def quality_focal_loss(
    pred,
    target,
    weight=None,
    beta=2.0,
    reduction="mean",
    avg_factor=None,
):
    """QFL (`lfd/model/losses/gfocal_loss.py:10-51`).

    pred: (N, C) logits. target = (label (N,), score (N,)): positives are rows
    with 0 <= label < C and are supervised toward `score` on their label
    column; everything else toward 0, modulated by |score - sigmoid|^beta.
    """
    label, score = target
    C = pred.shape[-1]
    sig = jax.nn.sigmoid(pred)

    neg_loss = _bce_with_logits(pred, jnp.zeros_like(pred)) * jnp.power(sig, beta)

    pos_row = (label >= 0) & (label < C)
    label_safe = jnp.clip(label, 0, C - 1)
    onehot = jax.nn.one_hot(label_safe, C, dtype=pred.dtype) * pos_row[:, None]
    pos_scale = jnp.abs(score[:, None] - sig)
    pos_loss = _bce_with_logits(pred, jnp.broadcast_to(score[:, None], pred.shape)) * jnp.power(
        pos_scale, beta
    )
    loss = jnp.where(onehot > 0, pos_loss, neg_loss)
    loss = jnp.sum(loss, axis=1)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def distribution_focal_loss(pred, label, weight=None, reduction="mean", avg_factor=None):
    """DFL (`lfd/model/losses/gfocal_loss.py:54-76`)."""
    dis_left = label.astype(jnp.int32)
    dis_right = dis_left + 1
    weight_left = dis_right.astype(pred.dtype) - label
    weight_right = label - dis_left.astype(pred.dtype)
    logp = jax.nn.log_softmax(pred, axis=-1)
    ce_left = -jnp.take_along_axis(logp, dis_left[:, None], axis=1)[:, 0]
    ce_right = -jnp.take_along_axis(logp, dis_right[:, None], axis=1)[:, 0]
    loss = ce_left * weight_left + ce_right * weight_right
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


# ---------------------------------------------------------------------------
# IoU-family losses (aligned xyxy boxes)
# ---------------------------------------------------------------------------

def _aligned_iou_parts(pred, target, eps):
    lt = jnp.maximum(pred[..., :2], target[..., :2])
    rb = jnp.minimum(pred[..., 2:], target[..., 2:])
    wh = jnp.clip(rb - lt, 0, None)
    overlap = wh[..., 0] * wh[..., 1]
    ap = (pred[..., 2] - pred[..., 0]) * (pred[..., 3] - pred[..., 1])
    ag = (target[..., 2] - target[..., 0]) * (target[..., 3] - target[..., 1])
    union = ap + ag - overlap + eps
    return overlap, union


def _reduce_iou_weight(weight):
    # (n, 4) weights reduce to (n,) by mean (`iou_loss.py:307-312`).
    if weight is not None and weight.ndim > 1:
        weight = jnp.mean(weight, axis=-1)
    return weight


def iou_loss(pred, target, weight=None, eps=1e-6, reduction="mean", avg_factor=None):
    """-log(IoU) (`lfd/model/losses/iou_loss.py:105-123`).

    Uses union clamped >= eps (via bbox_overlaps) then IoU clamped >= eps.
    """
    lt = jnp.maximum(pred[..., :2], target[..., :2])
    rb = jnp.minimum(pred[..., 2:], target[..., 2:])
    wh = jnp.clip(rb - lt, 0, None)
    overlap = wh[..., 0] * wh[..., 1]
    ap = (pred[..., 2] - pred[..., 0]) * (pred[..., 3] - pred[..., 1])
    ag = (target[..., 2] - target[..., 0]) * (target[..., 3] - target[..., 1])
    union = jnp.maximum(ap + ag - overlap, eps)
    ious = jnp.clip(overlap / union, eps, None)
    loss = -jnp.log(ious)
    return weight_reduce_loss(loss, _reduce_iou_weight(weight), reduction, avg_factor)


def giou_loss(pred, target, weight=None, eps=1e-7, reduction="mean", avg_factor=None):
    """1 - GIoU (`iou_loss.py:126-169`)."""
    overlap, union = _aligned_iou_parts(pred, target, eps)
    ious = overlap / union
    enc_lt = jnp.minimum(pred[..., :2], target[..., :2])
    enc_rb = jnp.maximum(pred[..., 2:], target[..., 2:])
    enc_wh = jnp.clip(enc_rb - enc_lt, 0, None)
    enclose = enc_wh[..., 0] * enc_wh[..., 1] + eps
    gious = ious - (enclose - union) / enclose
    loss = 1.0 - gious
    return weight_reduce_loss(loss, _reduce_iou_weight(weight), reduction, avg_factor)


def _center_distance_sq(pred, target):
    left = ((target[..., 0] + target[..., 2]) - (pred[..., 0] + pred[..., 2])) ** 2 / 4
    right = ((target[..., 1] + target[..., 3]) - (pred[..., 1] + pred[..., 3])) ** 2 / 4
    return left + right


def diou_loss(pred, target, weight=None, eps=1e-7, reduction="mean", avg_factor=None):
    """1 - DIoU (`iou_loss.py:172-228`)."""
    overlap, union = _aligned_iou_parts(pred, target, eps)
    ious = overlap / union
    enc_lt = jnp.minimum(pred[..., :2], target[..., :2])
    enc_rb = jnp.maximum(pred[..., 2:], target[..., 2:])
    enc_wh = jnp.clip(enc_rb - enc_lt, 0, None)
    c2 = enc_wh[..., 0] ** 2 + enc_wh[..., 1] ** 2 + eps
    rho2 = _center_distance_sq(pred, target)
    loss = 1.0 - (ious - rho2 / c2)
    return weight_reduce_loss(loss, _reduce_iou_weight(weight), reduction, avg_factor)


def ciou_loss(pred, target, weight=None, eps=1e-7, reduction="mean", avg_factor=None):
    """1 - CIoU (`iou_loss.py:231-289`), including its v**2/(1-iou+v) form."""
    overlap, union = _aligned_iou_parts(pred, target, eps)
    ious = overlap / union
    enc_lt = jnp.minimum(pred[..., :2], target[..., :2])
    enc_rb = jnp.maximum(pred[..., 2:], target[..., 2:])
    enc_wh = jnp.clip(enc_rb - enc_lt, 0, None)
    c2 = enc_wh[..., 0] ** 2 + enc_wh[..., 1] ** 2 + eps
    rho2 = _center_distance_sq(pred, target)
    w1 = pred[..., 2] - pred[..., 0]
    h1 = pred[..., 3] - pred[..., 1] + eps
    w2 = target[..., 2] - target[..., 0]
    h2 = target[..., 3] - target[..., 1] + eps
    factor = 4.0 / math.pi**2
    v = factor * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
    # guard the aspect-consistency denominator: for identical boxes f32
    # rounds ious to exactly 1 and v to 0, making the raw form 0/0
    cious = ious - (rho2 / c2 + v**2 / jnp.maximum(1.0 - ious + v, eps))
    loss = 1.0 - cious
    return weight_reduce_loss(loss, _reduce_iou_weight(weight), reduction, avg_factor)


# ---------------------------------------------------------------------------
# Classification / regression basics
# ---------------------------------------------------------------------------

def cross_entropy_loss(pred, label, weight=None, reduction="mean", avg_factor=None):
    """Softmax CE over C(+1 bg) channels (`cross_entropy_loss.py:12-22`)."""
    logp = jax.nn.log_softmax(pred, axis=-1)
    loss = -jnp.take_along_axis(logp, label[:, None].astype(jnp.int32), axis=1)[:, 0]
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def binary_cross_entropy_loss(pred, label, weight=None, reduction="mean", avg_factor=None):
    """Multi-label BCE on soft targets (`bce_with_logits_loss.py:28-45`)."""
    loss = _bce_with_logits(pred, label.astype(pred.dtype))
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def smooth_l1_loss(pred, target, weight=None, beta=1.0, reduction="mean", avg_factor=None):
    """`smooth_l1_loss.py:11-28`."""
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def l1_loss(pred, target, weight=None, reduction="mean", avg_factor=None):
    loss = jnp.abs(pred - target)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def mse_loss(pred, target, weight=None, reduction="mean", avg_factor=None):
    loss = (pred - target) ** 2
    return weight_reduce_loss(loss, weight, reduction, avg_factor)
