# Vectorized, shape-static target assignment for the LFD / LFDv2 / FCOS
# detectors.
#
# The reference generates targets with a per-image CPU loop over dynamic-length
# GT lists plus data-dependent scatter writes (`lfd/model/lfd.py:109-259`,
# `lfd/model/lfdv2.py:281-418`, `lfd/model/fcos.py:116-186`). On TPU that is
# reformulated as a single (P, Nmax) broadcast computation over *padded* GT
# arrays with a validity mask, fully inside jit:
#
#   - "ascending sort, highest score written last" scatter disambiguation
#     (`lfd.py:235-257`) == per-class max-reduction over the GT axis.
#   - gray writes happen AFTER green writes in the reference, so a gray hit
#     overrides a green score of the same class at the same point == where().
#   - regression target = delta of the argmax-score green GT.
#
# All functions operate on a single image; use jax.vmap for the batch.

from __future__ import annotations

import jax
import jax.numpy as jnp

INF = 1e8


def _point_gt_geometry(points, gt_bboxes):
    """Shared (P, N) geometry: deltas and centers.

    gt_bboxes are xywh with inclusive extents: right = x + w - 1
    (`lfd/model/lfd.py:201-205`).
    Returns (delta (P,N,4) in l,t,r,b order, cx (N,), cy (N,)).
    """
    px = points[:, 0][:, None]  # (P, 1)
    py = points[:, 1][:, None]
    gx = gt_bboxes[:, 0][None, :]  # (1, N)
    gy = gt_bboxes[:, 1][None, :]
    gw = gt_bboxes[:, 2][None, :]
    gh = gt_bboxes[:, 3][None, :]
    d_l = px - gx
    d_t = py - gy
    d_r = (gx + gw - 1.0) - px
    d_b = (gy + gh - 1.0) - py
    delta = jnp.stack([d_l, d_t, d_r, d_b], axis=-1)
    cx = gt_bboxes[:, 0] + gt_bboxes[:, 2] / 2.0
    cy = gt_bboxes[:, 1] + gt_bboxes[:, 3] / 2.0
    return delta, cx, cy


def _assign_measure(mode, gt_bboxes, delta):
    """Range-assignment measure per (P, N) pair (`lfd.py:208-217`)."""
    gw = gt_bboxes[:, 2][None, :]
    gh = gt_bboxes[:, 3][None, :]
    if mode == "longer":
        m = jnp.maximum(gw, gh)
        m = jnp.broadcast_to(m, delta.shape[:2])
    elif mode == "shorter":
        m = jnp.minimum(gw, gh)
        m = jnp.broadcast_to(m, delta.shape[:2])
    elif mode == "sqrt":
        m = jnp.sqrt(gw * gh)
        m = jnp.broadcast_to(m, delta.shape[:2])
    elif mode == "dist":
        m = jnp.max(delta, axis=-1)
    else:
        raise ValueError(f"Unsupported range assign mode: {mode}")
    return m


def _select_regression_target(scores, delta):
    """Per-point regression target = delta of the max-score GT.

    Matches the reference's "sort ascending then max" selection
    (`lfd.py:252-257`) wherever a positive candidate exists; points with no
    candidate get zeros (the reference leaves garbage there from an arbitrary
    GT — those positions are masked out of the loss either way, and zeros
    reproduce its `num_gt == 0` early-exit, `lfd.py:170-172`).
    """
    sel = jnp.argmax(scores, axis=1)  # (P,)
    any_pos = jnp.max(scores, axis=1) > 0
    out = jnp.take_along_axis(delta, sel[:, None, None], axis=1)[:, 0, :]
    return jnp.where(any_pos[:, None], out, 0.0)


def lfd_assign(
    points,
    strides,
    regression_ranges,
    gray_ranges,
    gt_bboxes,
    gt_labels,
    gt_mask,
    num_classes,
    range_assign_mode="dist",
    normalize_by_range=False,
):
    """LFD (v1) target assignment (`lfd/model/lfd.py:155-259`).

    Args:
      points: (P, 2) float [x, y] image coordinates.
      strides: (P,) float per-point stride.
      regression_ranges: (P, 2) float per-point (low, up).
      gray_ranges: (P, 2) float per-point gray band (low, up).
      gt_bboxes: (N, 4) float xywh (padded).
      gt_labels: (N,) int32 0-based class labels (padded).
      gt_mask: (N,) bool validity of each GT row.
      num_classes: C.
      range_assign_mode: 'longer' | 'shorter' | 'sqrt' | 'dist'.
      normalize_by_range: True for independent (SmoothL1/MSE) regression —
        deltas divided by the range upper bound (`lfd.py:219-220`).

    Returns:
      cls_targets: (P, C) float soft scores; -1 marks gray-ignored entries.
      reg_targets: (P, 4) float (l, t, r, b) deltas of the selected GT.
    """
    P = points.shape[0]
    delta, cx, cy = _point_gt_geometry(points, gt_bboxes)

    # Center-proximity score in (0, 1]: sqrt(1/max(1, |dx|/(s/2))) per axis
    # (`lfd.py:190-199`).
    half_s = (strides / 2.0)[:, None]
    ax = jnp.abs(points[:, 0][:, None] - cx[None, :]) / half_s
    ay = jnp.abs(points[:, 1][:, None] - cy[None, :]) / half_s
    ax = jnp.maximum(ax, 1.0)
    ay = jnp.maximum(ay, 1.0)
    point_scores = jnp.sqrt(1.0 / ax) * jnp.sqrt(1.0 / ay)  # (P, N)

    measure = _assign_measure(range_assign_mode, gt_bboxes, delta)

    if normalize_by_range:
        reg_delta = delta / regression_ranges[:, None, 1, None]
    else:
        reg_delta = delta

    rr_lo = regression_ranges[:, None, 0]
    rr_up = regression_ranges[:, None, 1]
    gr_lo = gray_ranges[:, None, 0]
    gr_up = gray_ranges[:, None, 1]

    hit = jnp.min(delta, axis=-1) >= 0
    valid = gt_mask[None, :]
    green = (rr_lo <= measure) & (measure <= rr_up) & hit & valid
    gray = (
        ((gr_lo <= measure) & (measure < rr_lo))
        | ((rr_up < measure) & (measure <= gr_up))
    ) & hit & valid

    # Per-class green score: max over GTs of that class (== "largest score
    # written last" in the reference scatter, `lfd.py:243-246`).
    onehot = jax.nn.one_hot(gt_labels, num_classes, dtype=point_scores.dtype)  # (N, C)
    green_scores = point_scores[:, :, None] * green[:, :, None] * onehot[None, :, :]
    cls_green = jnp.max(green_scores, axis=1)  # (P, C)

    # Gray overrides green for the same class (`lfd.py:248-251` runs after).
    gray_any = jnp.max(gray[:, :, None] * onehot[None, :, :], axis=1) > 0  # (P, C)
    cls_targets = jnp.where(gray_any, -1.0, cls_green)

    reg_targets = _select_regression_target(point_scores * green, reg_delta)
    return cls_targets, reg_targets


def lfdv2_assign(
    points,
    strides,
    regression_ranges,
    gray_ranges,
    gt_bboxes,
    gt_labels,
    gt_mask,
    num_classes,
    range_assign_mode="longer",
    normalize_by_range=False,
):
    """LFDv2 target assignment (`lfd/model/lfdv2.py:281-418`).

    Differences from v1: FCOS-style centerness score, a stride-sized "core
    zone" around the GT center forced to score 1.0, and a linear gray-zone
    relaxation multiplier instead of hard -1 ignores. No gray targets exist.
    """
    delta, cx, cy = _point_gt_geometry(points, gt_bboxes)
    hit = jnp.min(delta, axis=-1) >= 0  # (P, N)

    # Centerness score on hit-filtered deltas (`lfdv2.py:325-337`).
    fdelta = delta * hit[:, :, None]
    lr_min = jnp.clip(jnp.minimum(fdelta[..., 0], fdelta[..., 2]), 0.0, None)
    lr_max = jnp.clip(jnp.maximum(fdelta[..., 0], fdelta[..., 2]), 0.01, None)
    tb_min = jnp.clip(jnp.minimum(fdelta[..., 1], fdelta[..., 3]), 0.0, None)
    tb_max = jnp.clip(jnp.maximum(fdelta[..., 1], fdelta[..., 3]), 0.01, None)
    point_scores = jnp.sqrt((lr_min / lr_max) * (tb_min / tb_max))

    # Core zone: within stride/2 of the GT center, score := 1 (`lfdv2.py:339-348`).
    px = points[:, 0][:, None]
    py = points[:, 1][:, None]
    s2 = (strides / 2.0)[:, None]
    core = (
        (px >= cx[None, :] - s2)
        & (px <= cx[None, :] + s2)
        & (py >= cy[None, :] - s2)
        & (py <= cy[None, :] + s2)
        & hit
    )
    point_scores = jnp.where(core, 1.0, point_scores)

    measure = _assign_measure(range_assign_mode, gt_bboxes, delta)

    if normalize_by_range:
        reg_delta = delta / regression_ranges[:, None, 1, None]
    else:
        reg_delta = delta

    rr_lo = regression_ranges[:, None, 0]
    rr_up = regression_ranges[:, None, 1]
    gr_lo = gray_ranges[:, None, 0]
    gr_up = gray_ranges[:, None, 1]

    # Linear gray-zone relaxation multiplier (`lfdv2.py:364-378`).
    left_mult = (measure - gr_lo) / jnp.clip(rr_lo - gr_lo, 0.01, None)
    left_ind = (gr_lo <= measure) & (measure < rr_lo)
    in_range = (rr_lo <= measure) & (measure <= rr_up)
    right_mult = (gr_up - measure) / jnp.clip(gr_up - rr_up, 0.01, None)
    right_ind = (rr_up < measure) & (measure <= gr_up)
    relaxation = left_mult * left_ind + in_range + right_mult * right_ind

    point_scores = point_scores * relaxation * gt_mask[None, :]

    onehot = jax.nn.one_hot(gt_labels, num_classes, dtype=point_scores.dtype)
    pos = point_scores > 0
    cls_targets = jnp.max(
        point_scores[:, :, None] * pos[:, :, None] * onehot[None, :, :], axis=1
    )

    reg_targets = _select_regression_target(point_scores, reg_delta)
    return cls_targets, reg_targets


def fcos_assign(
    points,
    regression_ranges,
    gt_bboxes,
    gt_labels,
    gt_mask,
    num_classes,
):
    """FCOS target assignment (`lfd/model/fcos.py:116-186`).

    Hard labels with min-area disambiguation: a point inside multiple valid
    GTs regresses the smallest one. Background label is `num_classes`.

    Returns (labels (P,) int32, reg_targets (P, 4) float).
    """
    P = points.shape[0]
    delta, _, _ = _point_gt_geometry(points, gt_bboxes)

    inside = jnp.min(delta, axis=-1) > 0  # strictly inside (`fcos.py:163`)
    max_dist = jnp.max(delta, axis=-1)
    in_range = (max_dist >= regression_ranges[:, None, 0]) & (
        max_dist <= regression_ranges[:, None, 1]
    )
    valid = inside & in_range & gt_mask[None, :]

    areas = (gt_bboxes[:, 2] * gt_bboxes[:, 3])[None, :]
    areas = jnp.where(valid, areas, INF)
    min_areas = jnp.min(areas, axis=1)
    min_idx = jnp.argmin(areas, axis=1)

    labels = jnp.where(min_areas >= INF, num_classes, gt_labels[min_idx]).astype(jnp.int32)
    reg_targets = jnp.take_along_axis(delta, min_idx[:, None, None], axis=1)[:, 0, :]
    return labels, reg_targets


def fcos_v1_assign(
    points,
    regression_ranges,
    gt_bboxes,
    gt_labels,
    gt_mask,
    num_classes,
):
    """FCOSv1 multi-class-per-point assignment (`lfd/model/fcos.py:575-640`):
    every valid (point, gt) pair marks that gt's class foreground at the
    point (a point may be positive for several classes); regression still
    targets the min-area gt.

    Returns (fg (P, C) bool, reg_targets (P, 4)).
    """
    P = points.shape[0]
    delta, _, _ = _point_gt_geometry(points, gt_bboxes)
    inside = jnp.min(delta, axis=-1) > 0
    max_dist = jnp.max(delta, axis=-1)
    in_range = (max_dist >= regression_ranges[:, None, 0]) & (
        max_dist <= regression_ranges[:, None, 1]
    )
    valid = inside & in_range & gt_mask[None, :]

    onehot = jax.nn.one_hot(gt_labels, num_classes, dtype=jnp.float32)  # (N, C)
    fg = jnp.max(valid[:, :, None] * onehot[None, :, :], axis=1) > 0  # (P, C)

    areas = (gt_bboxes[:, 2] * gt_bboxes[:, 3])[None, :]
    areas = jnp.where(valid, areas, INF)
    min_idx = jnp.argmin(areas, axis=1)
    reg_targets = jnp.take_along_axis(delta, min_idx[:, None, None], axis=1)[:, 0, :]
    return fg, reg_targets


def centerness_target(reg_targets, eps=0.0):
    """FCOS centerness: sqrt((min/max lr) * (min/max tb)) (`fcos.py:211-215`)."""
    lr_min = jnp.minimum(reg_targets[..., 0], reg_targets[..., 2])
    lr_max = jnp.maximum(reg_targets[..., 0], reg_targets[..., 2])
    tb_min = jnp.minimum(reg_targets[..., 1], reg_targets[..., 3])
    tb_max = jnp.maximum(reg_targets[..., 1], reg_targets[..., 3])
    ratio = (lr_min / jnp.maximum(lr_max, 1e-12)) * (tb_min / jnp.maximum(tb_max, 1e-12))
    return jnp.sqrt(jnp.clip(ratio, 0.0, None) + eps)
