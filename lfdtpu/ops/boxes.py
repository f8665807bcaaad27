# Box geometry primitives (pure jnp; shape-static, jit/vmap friendly).
#
# Conventions follow the reference exactly:
#   - Annotations are xywh with inclusive pixel extents: x2 = x1 + w - 1
#     (reference `lfd/model/lfd.py:201-205`, result rows `lfd.py:646-654`).
#   - Decoded/IoU boxes are xyxy with *exclusive* area math (no +1), matching
#     `lfd/model/losses/iou_loss.py:11-102`.

from __future__ import annotations

import jax.numpy as jnp


def xywh_to_xyxy(boxes, inclusive=True):
    """[x, y, w, h] -> [x1, y1, x2, y2]; x2 = x1+w-1 when inclusive."""
    off = 1.0 if inclusive else 0.0
    x1 = boxes[..., 0]
    y1 = boxes[..., 1]
    x2 = boxes[..., 0] + boxes[..., 2] - off
    y2 = boxes[..., 1] + boxes[..., 3] - off
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def xyxy_to_xywh(boxes, inclusive=True):
    """[x1, y1, x2, y2] -> [x, y, w, h]; w = x2-x1+1 when inclusive."""
    off = 1.0 if inclusive else 0.0
    w = boxes[..., 2] - boxes[..., 0] + off
    h = boxes[..., 3] - boxes[..., 1] + off
    return jnp.stack([boxes[..., 0], boxes[..., 1], w, h], axis=-1)


def distance2bbox(points, distance, max_shape=None):
    """Decode (l, t, r, b) distances at `points` into xyxy boxes.

    Mirrors `lfd/model/lfd.py:261-282`: x1 = px - l, y1 = py - t,
    x2 = px + r, y2 = py + b, optionally clamped to (h, w) of `max_shape`.
    Works on any leading batch shape: points (..., 2), distance (..., 4).
    """
    x1 = points[..., 0] - distance[..., 0]
    y1 = points[..., 1] - distance[..., 1]
    x2 = points[..., 0] + distance[..., 2]
    y2 = points[..., 1] + distance[..., 3]
    if max_shape is not None:
        h, w = max_shape
        x1 = jnp.clip(x1, 0, w)
        y1 = jnp.clip(y1, 0, h)
        x2 = jnp.clip(x2, 0, w)
        y2 = jnp.clip(y2, 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def bbox2distance(points, bboxes):
    """Inverse of distance2bbox: xyxy boxes -> (l, t, r, b) at `points`."""
    l = points[..., 0] - bboxes[..., 0]
    t = points[..., 1] - bboxes[..., 1]
    r = bboxes[..., 2] - points[..., 0]
    b = bboxes[..., 3] - points[..., 1]
    return jnp.stack([l, t, r, b], axis=-1)


def bbox_overlaps(bboxes1, bboxes2, mode="iou", is_aligned=False, eps=1e-6):
    """Pairwise / aligned IoU (or IoF) of xyxy boxes.

    Semantics of `lfd/model/losses/iou_loss.py:11-102` (exclusive area math,
    union clamped to >= eps). Shapes: (..., m, 4) x (..., n, 4) -> (..., m, n),
    or aligned (..., m, 4) x (..., m, 4) -> (..., m).
    """
    assert mode in ("iou", "iof")
    if is_aligned:
        lt = jnp.maximum(bboxes1[..., :2], bboxes2[..., :2])
        rb = jnp.minimum(bboxes1[..., 2:], bboxes2[..., 2:])
        wh = jnp.clip(rb - lt, 0, None)
        overlap = wh[..., 0] * wh[..., 1]
        area1 = (bboxes1[..., 2] - bboxes1[..., 0]) * (bboxes1[..., 3] - bboxes1[..., 1])
        if mode == "iou":
            area2 = (bboxes2[..., 2] - bboxes2[..., 0]) * (bboxes2[..., 3] - bboxes2[..., 1])
            union = area1 + area2 - overlap
        else:
            union = area1
    else:
        lt = jnp.maximum(bboxes1[..., :, None, :2], bboxes2[..., None, :, :2])
        rb = jnp.minimum(bboxes1[..., :, None, 2:], bboxes2[..., None, :, 2:])
        wh = jnp.clip(rb - lt, 0, None)
        overlap = wh[..., 0] * wh[..., 1]
        area1 = (bboxes1[..., 2] - bboxes1[..., 0]) * (bboxes1[..., 3] - bboxes1[..., 1])
        if mode == "iou":
            area2 = (bboxes2[..., 2] - bboxes2[..., 0]) * (bboxes2[..., 3] - bboxes2[..., 1])
            union = area1[..., :, None] + area2[..., None, :] - overlap
        else:
            union = jnp.broadcast_to(area1[..., :, None], overlap.shape)
    union = jnp.maximum(union, eps)
    return overlap / union
