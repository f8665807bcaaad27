# Non-maximum suppression.
#
# Two implementations with identical greedy semantics (sort by score desc,
# suppress IoU > thr, exclusive-area IoU — `nms/src/cpu/nms_cpu.cpp:7-74`):
#
#   1. Host path: numpy (with an optional C++ .so fast path from
#      `lfdtpu/native`) for the numpy-array `nms()` / `soft_nms()` public API
#      (`lfd/model/utils/nms.py:7-116`).
#
#   2. Device path: shape-static jnp for jit'd end-to-end inference. The
#      sequential greedy recurrence keep[j] = !any_{i<j}(keep[i] & iou[i,j]>t)
#      is solved by fixpoint iteration on the full (K, K) IoU matrix: each
#      sweep is pure vector work on the VPU and the iteration count is the
#      suppression chain depth (typically 2-4), not K. This replaces the
#      CUDA 64-box bitmask kernel (`nms/src/cuda/nms_kernel.cu:24-68`) with a
#      formulation XLA/TPU executes well.
#
# The class-offset trick for per-class NMS in one call ports unchanged
# (`lfd/model/utils/nms.py:119-158`).

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


# ---------------------------------------------------------------------------
# Host (numpy / native) path
# ---------------------------------------------------------------------------

def _nms_numpy_impl(dets, iou_thr):
    x1, y1, x2, y2, scores = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], dets[:, 4]
    areas = (x2 - x1) * (y2 - y1)
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(dets), dtype=bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = np.maximum(x1[i], x1)
        yy1 = np.maximum(y1[i], y1)
        xx2 = np.minimum(x2[i], x2)
        yy2 = np.minimum(y2[i], y2)
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        iou = inter / (areas[i] + areas - inter)
        suppressed |= iou > iou_thr
        suppressed[i] = True  # kept, never revisited
    return np.asarray(keep, dtype=np.int64)


def nms(dets, iou_thr):
    """Greedy NMS on a (K, 5) [x1, y1, x2, y2, score] array.

    Returns (kept_dets, kept_indices) like `lfd/model/utils/nms.py:7-59`.
    Uses the native C++ kernel from `lfdtpu.native` when available.
    """
    dets = np.asarray(dets)
    if dets.shape[0] == 0:
        return dets, np.zeros((0,), dtype=np.int64)
    try:
        from ..native import nms_native

        inds = nms_native(dets.astype(np.float32, copy=False), float(iou_thr))
    except Exception:
        inds = _nms_numpy_impl(dets, iou_thr)
    return dets[inds, :], inds


def soft_nms(dets, iou_thr, method="linear", sigma=0.5, min_score=1e-3):
    """Soft-NMS (linear / gaussian), CPU only, mirroring
    `nms/src/cpu/nms_cpu.cpp:76-293` / `lfd/model/utils/nms.py:62-116`.

    Returns (new_dets (K', 5), indices (K',)).
    """
    assert method in ("linear", "gaussian")
    dets = np.array(dets, dtype=np.float32, copy=True)
    N = dets.shape[0]
    if N == 0:
        return dets[:, :5], np.zeros((0,), dtype=np.int64)
    try:
        from ..native import soft_nms_native

        return soft_nms_native(
            dets, float(iou_thr), {"linear": 1, "gaussian": 2}[method],
            float(sigma), float(min_score),
        )
    except Exception:
        pass
    inds = np.arange(N)
    kept_rows = []
    kept_inds = []
    boxes = dets[:, :4].copy()
    scores = dets[:, 4].copy()
    active = np.ones(N, dtype=bool)
    while active.any():
        cand = np.where(active)[0]
        i = cand[np.argmax(scores[cand])]
        kept_rows.append(np.concatenate([boxes[i], [scores[i]]]))
        kept_inds.append(inds[i])
        active[i] = False
        if not active.any():
            break
        rest = np.where(active)[0]
        xx1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        area_r = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / (area_i + area_r - inter)
        if method == "linear":
            decay = np.where(iou > iou_thr, 1.0 - iou, 1.0)
        else:
            decay = np.exp(-(iou * iou) / sigma)
        scores[rest] *= decay
        active[rest] &= scores[rest] >= min_score
    new_dets = np.stack(kept_rows, axis=0) if kept_rows else np.zeros((0, 5), np.float32)
    return new_dets, np.asarray(kept_inds, dtype=np.int64)


def nms_match(dets, iou_thr):
    """Group boxes by greedy-NMS suppression (`nms_ext.nms_match` /
    `nms_cpu.cpp` nms_match_cpu): returns a list of index groups, each led
    by a kept box followed by the boxes it suppressed."""
    dets = np.asarray(dets)
    if dets.shape[0] == 0:
        return []
    x1, y1, x2, y2, scores = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], dets[:, 4]
    areas = (x2 - x1) * (y2 - y1)
    order = np.argsort(-scores, kind="stable")
    suppressed = np.zeros(len(dets), dtype=bool)
    groups = []
    for i in order:
        if suppressed[i]:
            continue
        xx1 = np.maximum(x1[i], x1)
        yy1 = np.maximum(y1[i], y1)
        xx2 = np.minimum(x2[i], x2)
        yy2 = np.minimum(y2[i], y2)
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        iou = inter / (areas[i] + areas - inter)
        members = [int(i)]
        for j in order:
            if j == i or suppressed[j]:
                continue
            if iou[j] > iou_thr:
                suppressed[j] = True
                members.append(int(j))
        suppressed[i] = True
        groups.append(members)
    return groups


# ---------------------------------------------------------------------------
# Device (jnp, shape-static) path
# ---------------------------------------------------------------------------

def _iou_matrix(boxes):
    """(K, K) exclusive-area IoU (devIoU semantics, `nms_kernel.cu:10-22`)."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1) * (y2 - y1)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.clip(xx2 - xx1, 0, None) * jnp.clip(yy2 - yy1, 0, None)
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


def nms_mask(boxes, scores, iou_thr, valid=None, use_pallas=None):
    """Exact greedy-NMS keep mask, shape-static.

    Args:
      boxes: (K, 4) xyxy, any order.
      scores: (K,) used for the greedy ordering.
      iou_thr: suppression threshold (IoU strictly greater suppresses).
      valid: optional (K,) bool; invalid rows never keep nor suppress.
      use_pallas: force (True/False) the on-chip Pallas kernel; default:
        auto — used on TPU when the (K, K) matrix fits VMEM.

    Returns (K,) bool keep mask in the ORIGINAL ordering.
    """
    K = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((K,), dtype=bool)
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    order = jnp.argsort(jnp.where(valid, scores, neg_inf))[::-1]
    sboxes = boxes[order]
    svalid = valid[order]

    if use_pallas is None:
        from .nms_pallas import PALLAS_NMS_MAX_K

        use_pallas = jax.default_backend() == "tpu" and K <= PALLAS_NMS_MAX_K

    if use_pallas:
        from .nms_pallas import nms_mask_pallas_sorted

        keep_sorted = nms_mask_pallas_sorted(sboxes, svalid, iou_thr)
        return jnp.zeros((K,), dtype=bool).at[order].set(keep_sorted)

    iou = _iou_matrix(sboxes)
    rows = jnp.arange(K)
    # sup[i, j]: kept i (earlier in order) would suppress j.
    sup = (iou > iou_thr) & (rows[:, None] < rows[None, :])
    sup = sup & svalid[:, None]

    def body(state):
        keep, _ = state
        suppressed = jnp.any(sup & keep[:, None], axis=0)
        new_keep = svalid & ~suppressed
        return new_keep, keep

    def cond(state):
        keep, prev = state
        return jnp.any(keep != prev)

    init = (svalid, jnp.zeros_like(svalid))
    keep_sorted, _ = jax.lax.while_loop(cond, body, init)

    keep = jnp.zeros((K,), dtype=bool).at[order].set(keep_sorted)
    return keep


def batched_nms_jax(boxes, scores, idxs, iou_thr, valid=None,
                    class_agnostic=False, use_pallas=None):
    """Per-class NMS in one call via the class-offset trick
    (`lfd/model/utils/nms.py:119-158`). Returns a keep mask (K,)."""
    if class_agnostic:
        boxes_for_nms = boxes
    else:
        max_coord = jnp.max(jnp.where((valid if valid is not None else True), boxes.max(axis=-1), 0.0))
        offsets = idxs.astype(boxes.dtype) * (max_coord + 1.0)
        boxes_for_nms = boxes + offsets[:, None]
    return nms_mask(boxes_for_nms, scores, iou_thr, valid=valid,
                    use_pallas=use_pallas)


@partial(jax.jit, static_argnames=("score_thr", "iou_thr", "max_num", "class_agnostic"))
def multiclass_nms_jax(
    bboxes,
    scores,
    score_thr,
    iou_thr,
    max_num=100,
    class_agnostic=False,
    valid=None,
):
    """Static-shape multiclass NMS (`lfd/model/utils/nms.py:161-220`).

    Args:
      bboxes: (K, 4) xyxy candidate boxes (already top-k pre-filtered).
      scores: (K,) candidate scores.
      ...labels are carried alongside by passing them through `gather` with
      the returned order; see decode.decode_predictions for the fused caller.
    Here K is the static candidate budget; `valid` marks live rows.

    Returns:
      keep_mask: (K,) bool, scores > score_thr and NMS survivors.
      order: (K,) int32 — indices sorting survivors by descending score;
        padded tail refers to arbitrary suppressed rows (mask is the truth).
      count: () int32 number of survivors (clipped at max_num).
    """
    K = bboxes.shape[0]
    if valid is None:
        valid = jnp.ones((K,), dtype=bool)
    valid = valid & (scores > score_thr)
    keep = nms_mask(bboxes, scores, iou_thr, valid=valid)

    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    masked = jnp.where(keep, scores, neg_inf)
    order = jnp.argsort(masked)[::-1].astype(jnp.int32)
    count = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), max_num)
    # drop survivors beyond max_num
    rank = jnp.zeros((K,), jnp.int32).at[order].set(jnp.arange(K, dtype=jnp.int32))
    keep = keep & (rank < max_num)
    return keep, order, count
