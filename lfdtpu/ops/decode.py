# Fused dense-prediction decode: scores -> top-k -> distance2bbox -> NMS.
#
# The reference decodes per level with dynamic-shape threshold filters and
# runs NMS in a CUDA extension (`lfd/model/lfd.py:577-641`,
# `lfd/model/lfdv2.py:593-669`). On TPU everything is one jitted function
# with static shapes:
#
#   stage 1: per-point max-class score -> lax.top_k over all P points
#   stage 2: expand the kept points to (Kp * C) (point, class) pairs,
#            mask by score_thr, lax.top_k down to the NMS budget
#   stage 3: decode distances for the kept points only, class-offset NMS,
#            emit a fixed (max_det, 6) result + valid count.
#
# This is exact w.r.t. the reference whenever the number of above-threshold
# candidates fits in the static budgets — guaranteed in practice (budgets
# default to 1000+ vs typically <300 survivors at thr=0.05).

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DecodeSpec:
    """Static decode configuration (hashable -> usable as jit static arg)."""

    num_classes: int
    use_softmax: bool = False  # CrossEntropyLoss head: C+1 channels, softmax
    reg_mode: str = "exp"  # 'exp' | 'sigmoid' | 'independent'
    score_thr: float = 0.05
    nms_iou: float = 0.4
    pre_nms_points: int = 1000  # stage-1 top-k over points
    nms_budget: int = 1000  # stage-2 candidate budget fed to NMS
    max_det: int = 100
    class_agnostic: bool = False
    # LFDv2's `pre_nms_bbox_limit` is applied PER LEVEL before the levels
    # are concatenated (`lfdv2.py:618-624`), and only when a level has more
    # points than the limit. >0 switches stage 1 to that semantics; the
    # caller must then pass `level_sizes` to decode_predictions.
    per_level_limit: int = 0
    # use jax.lax.approx_max_k for the stage-1 candidate selection: the
    # TPU-native partial reduction instead of a full sort. Only the
    # SELECTION is approximate (recall_target 0.99 among near-threshold
    # tail candidates); kept detections' scores/boxes are exact. Opt-in
    # (compile_inference(approx_topk=True)); the default path is exact
    # and bit-identical to predict_for_single_image.
    approx_topk: bool = False
    # NMS keep-mask backend: None = auto (Pallas VMEM kernel on TPU when
    # the (K, K) matrix fits, lax fixpoint otherwise); True/False force.
    # Exposed so engine variants can measure the two backends end-to-end.
    nms_use_pallas: bool | None = None


def _decode_distances(reg, points, ranges, mode):
    """Distance head -> (l, t, r, b) in pixels (`lfd.py:604-625`)."""
    if mode == "exp":
        # clamped: inf distances (possible from untrained weights) would
        # produce NaN IoUs inside NMS; e^30 px is far beyond any image
        return jnp.exp(jnp.minimum(reg.astype(jnp.float32), 30.0))
    if mode == "sigmoid":
        range_max = jnp.max(ranges, axis=-1, keepdims=True)
        return jax.nn.sigmoid(reg.astype(jnp.float32)) * range_max
    if mode == "independent":
        return reg * ranges[..., 1, None]
    if mode == "direct":
        # distances already in pixels (FCOS head applies exp internally,
        # `fcos_head.py:147-148`)
        return reg.astype(jnp.float32)
    raise ValueError(f"unknown reg mode {mode}")


@partial(jax.jit, static_argnames=("spec", "level_sizes"))
def decode_predictions(
    cls_logits,
    reg,
    points,
    ranges,
    spec: DecodeSpec,
    image_hw,
    point_valid=None,
    score_factors=None,
    level_sizes=None,
):
    """Decode one image's dense predictions into final detections.

    Args:
      cls_logits: (P, C) logits — or (P, C+1) when spec.use_softmax.
      reg: (P, 4) regression outputs.
      points: (P, 2) point coordinates (trace-time constants).
      ranges: (P, 2) per-point regression ranges.
      spec: DecodeSpec (static).
      image_hw: (h, w) used for box clamping — the *valid* image extent
        inside a padded input. May be python ints or traced scalars (one
        compiled program serves any actual extent at a fixed P).
      point_valid: optional (P,) bool masking points that fall inside
        padding; such points can never produce detections.
      score_factors: optional (P,) multiplier (FCOS centerness,
        `fcos.py:403-410`).
      level_sizes: static tuple of per-level point counts (sum == P);
        required when spec.per_level_limit > 0 (LFDv2 per-level top-k).

    Returns dict with:
      boxes:  (max_det, 4) xyxy (clamped to image_hw)
      scores: (max_det,)
      labels: (max_det,) int32
      count:  () int32 number of valid rows; rows >= count are zero.
    """
    P = cls_logits.shape[0]
    C = spec.num_classes

    # Stage-1 ranking works on ONE scalar per point, so the (P, C)
    # activation array never needs to exist: sigmoid is monotonic
    # (max_c sigmoid(l_c) == sigmoid(max_c l_c), bitwise — the same
    # element wins and gets the same op applied), and softmax's
    # foreground max is exp(max_fg − m)/z with the row's shared m/z.
    # The per-class activations are computed later for the Kp kept
    # points only. This removes a (P, C) f32 materialization the old
    # two-consumer form (max-reduce + gather) forced XLA to write to
    # HBM — ~90 MB/call at TT100K's 45 classes @1080p.
    if spec.use_softmax:
        m = jnp.max(cls_logits, axis=-1)  # over C+1 incl. bg
        z = jnp.sum(jnp.exp(cls_logits - m[:, None]), axis=-1)
        point_max = jnp.exp(jnp.max(cls_logits[:, :C], axis=-1) - m) / z
    else:
        point_max = jax.nn.sigmoid(jnp.max(cls_logits, axis=-1))
    if score_factors is not None:
        # factors are non-negative (sigmoid centerness): scaling commutes
        # with the per-point max, and it is the same multiplication the
        # per-class form would do on the winning element
        point_max = point_max * score_factors
    if point_valid is not None:
        point_max = jnp.where(point_valid, point_max, 0.0)

    def _topk(vals, k):
        if spec.approx_topk and k < vals.shape[-1]:
            return jax.lax.approx_max_k(vals, k, recall_target=0.99)
        return jax.lax.top_k(vals, k)
    if spec.per_level_limit > 0:
        # stage 1 (LFDv2 semantics, `lfdv2.py:618-624`): per level, keep the
        # top `per_level_limit` points by max-class score — only when the
        # level exceeds the limit — then concat the levels.
        assert level_sizes is not None and sum(level_sizes) == P, (
            "per_level_limit needs static level_sizes summing to P"
        )
        lim = spec.per_level_limit
        idx_parts = []
        off = 0
        for n in level_sizes:
            if n > lim:
                _, li = _topk(
                    jax.lax.dynamic_slice_in_dim(point_max, off, n), lim
                )
                idx_parts.append(li + off)
            else:
                idx_parts.append(jnp.arange(off, off + n, dtype=jnp.int32))
            off += n
        top_idx = jnp.concatenate(idx_parts)
        kp = top_idx.shape[0]
    else:
        # stage 1: top points by max-class score over ALL levels
        kp = min(spec.pre_nms_points, P)
        _, top_idx = _topk(point_max, kp)  # (Kp,)

    # per-class activations for the kept points only ((Kp, C) — tiny):
    # gathering logits then activating equals activating then gathering
    sel_logits = cls_logits[top_idx]
    if spec.use_softmax:
        sel_probs = jax.nn.softmax(sel_logits, axis=-1)[:, :C]
    else:
        sel_probs = jax.nn.sigmoid(sel_logits)
    if score_factors is not None:
        sel_probs = sel_probs * score_factors[top_idx][:, None]
    if point_valid is not None:
        sel_probs = jnp.where(point_valid[top_idx][:, None], sel_probs, 0.0)
    sel_reg = reg[top_idx]
    sel_points = points[top_idx]
    sel_ranges = ranges[top_idx]

    # stage 2: (point, class) pairs above threshold, top nms_budget.
    # For multi-class heads this is the largest selection in the decode
    # (Kp*C = 45k elements for TT100K's 45 classes) — it routes through
    # the same approx_topk knob as stage 1 (approx_max_k's partial
    # per-lane reduction beats the exact sort-based top_k on TPU).
    flat_scores = sel_probs.reshape(-1)  # (Kp * C,)
    flat_valid = flat_scores > spec.score_thr
    kb = min(spec.nms_budget, kp * C)
    cand_scores, cand_flat = _topk(
        jnp.where(flat_valid, flat_scores, -1.0), kb
    )
    cand_point = cand_flat // C
    cand_label = (cand_flat % C).astype(jnp.int32)
    cand_valid = cand_scores > spec.score_thr

    # stage 3: decode candidate boxes and run NMS
    dist = _decode_distances(
        sel_reg[cand_point], sel_points[cand_point], sel_ranges[cand_point], spec.reg_mode
    )
    px = sel_points[cand_point]
    h, w = image_hw
    x1 = jnp.clip(px[:, 0] - dist[:, 0], 0, w)
    y1 = jnp.clip(px[:, 1] - dist[:, 1], 0, h)
    x2 = jnp.clip(px[:, 0] + dist[:, 2], 0, w)
    y2 = jnp.clip(px[:, 1] + dist[:, 3], 0, h)
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1)

    from .nms import batched_nms_jax

    keep = batched_nms_jax(
        boxes,
        cand_scores,
        cand_label,
        spec.nms_iou,
        valid=cand_valid,
        class_agnostic=spec.class_agnostic,
        use_pallas=spec.nms_use_pallas,
    )

    # Final ordering: top max_det kept rows by score. lax.top_k, NOT
    # argsort — top_k has a dedicated fast TPU lowering while argsort is
    # a general variadic sort that measured +0.7 ms of the engine's
    # +1.58 ms decode cost at 1080p (campaign_r4 attrib-decode-* cells).
    # Non-kept rows sink to -inf, so "kept rows, descending score" is
    # preserved exactly; only the order among exactly-tied scores can
    # differ from a sort (top_k breaks ties by ascending index).
    neg_inf = jnp.asarray(-jnp.inf, cand_scores.dtype)
    masked = jnp.where(keep, cand_scores, neg_inf)
    md = spec.max_det
    k = min(md, masked.shape[0])
    _, out_idx = jax.lax.top_k(masked, k)
    out_keep = keep[out_idx]
    if md > k:  # fewer candidates than max_det: pad with dead rows
        pad = md - k
        out_idx = jnp.concatenate([out_idx, jnp.zeros((pad,), out_idx.dtype)])
        out_keep = jnp.concatenate([out_keep, jnp.zeros((pad,), bool)])
    count = jnp.sum(out_keep.astype(jnp.int32))

    zero = jnp.zeros((md,), boxes.dtype)
    out = dict(
        boxes=jnp.where(out_keep[:, None], boxes[out_idx], 0.0),
        scores=jnp.where(out_keep, cand_scores[out_idx], zero),
        labels=jnp.where(out_keep, cand_label[out_idx], 0).astype(jnp.int32),
        count=count,
    )
    return out


def prefetch_to_host(tree):
    """Start (without blocking) the D2H copy of every device-array leaf.
    On a remote-attached backend each blocking `np.asarray` is a full
    link round trip; starting all copies first makes a subsequent
    leaf-by-leaf conversion pay ~one round trip for the whole tree
    instead of one per leaf. Host/numpy leaves are left untouched."""
    import jax

    for leaf in jax.tree.leaves(tree):
        start = getattr(leaf, "copy_to_host_async", None)
        if start is not None:
            start()
    return tree


def detections_to_lists(decoded, resize_scale=1.0):
    """Host-side: fixed-size decode output -> reference result rows
    [class_label, score, x1, y1, w, h] with w = x2-x1+1 (`lfd.py:646-654`)."""
    import numpy as np

    prefetch_to_host(decoded)
    count = int(decoded["count"])
    boxes = np.asarray(decoded["boxes"])[:count] / float(resize_scale)
    scores = np.asarray(decoded["scores"])[:count]
    labels = np.asarray(decoded["labels"])[:count]
    results = []
    for i in range(count):
        x1, y1, x2, y2 = boxes[i]
        results.append(
            [int(labels[i]), float(scores[i]), float(x1), float(y1), float(x2 - x1 + 1), float(y2 - y1 + 1)]
        )
    return results
