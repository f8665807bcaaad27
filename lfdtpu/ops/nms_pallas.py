# Pallas TPU kernel for greedy-NMS suppression.
#
# TPU-native replacement for the reference's CUDA bitmask kernel
# (`nms/src/cuda/nms_kernel.cu:24-68`): instead of 64-box bitmask blocks +
# host-side mask reduction, the whole problem lives in VMEM — the (K, K)
# IoU matrix is computed once on the VPU, then the greedy recurrence
#   keep[j] = valid[j] & !any_{i<j}(keep[i] & iou[i,j] > thr)
# is solved by fixpoint sweeps entirely on-chip (sweep count = suppression
# chain depth, typically 2-4; each sweep is one (K, K) masked reduction).
# K <= ~1500 keeps the matrix within a 16MB VMEM budget; callers fall back
# to the lax implementation above that.
#
# Boxes must arrive sorted by descending score (the caller sorts — XLA's
# top-k/argsort are already optimal for that part).

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, valid_ref, thr_ref, keep_ref, iou_scratch):
    boxes = boxes_ref[:]  # (K, 4) f32, sorted by score desc
    valid = valid_ref[:] != 0  # (K, 1) int32 -> bool
    thr = thr_ref[0]
    K = boxes.shape[0]

    x1 = boxes[:, 0:1]
    y1 = boxes[:, 1:2]
    x2 = boxes[:, 2:3]
    y2 = boxes[:, 3:4]
    area = (x2 - x1) * (y2 - y1)  # (K, 1)

    xx1 = jnp.maximum(x1, x1.T)
    yy1 = jnp.maximum(y1, y1.T)
    xx2 = jnp.minimum(x2, x2.T)
    yy2 = jnp.minimum(y2, y2.T)
    inter = jnp.maximum(xx2 - xx1, 0.0) * jnp.maximum(yy2 - yy1, 0.0)
    union = jnp.maximum(area + area.T - inter, 1e-12)
    iou = inter / union  # (K, K)

    rows = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    # sup[i, j]: kept i (higher score) would suppress j
    sup = (iou > thr) & (rows < cols) & valid  # valid broadcasts over cols
    iou_scratch[:] = sup.astype(jnp.float32)

    valid_row = valid[:, 0]  # (K,)

    def sweep(state):
        keep, _ = state
        suppressed = jnp.max(iou_scratch[:] * keep[:, None], axis=0) > 0.0
        new_keep = valid_row & ~suppressed
        return new_keep, keep

    def not_converged(state):
        keep, prev = state
        return jnp.any(keep != prev)

    keep, _ = jax.lax.while_loop(
        not_converged, sweep, (valid_row, jnp.zeros_like(valid_row))
    )
    keep_ref[:] = keep[:, None].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def nms_mask_pallas_sorted(boxes_sorted, valid_sorted, iou_thr, interpret=False):
    """Keep mask for boxes already sorted by descending score.

    Args:
      boxes_sorted: (K, 4) f32 xyxy.
      valid_sorted: (K,) bool.
      iou_thr: scalar threshold.
    Returns (K,) bool keep mask (in sorted order).
    """
    K = boxes_sorted.shape[0]
    thr = jnp.asarray([iou_thr], jnp.float32).astype(jnp.float32)
    keep = pl.pallas_call(
        _nms_kernel,
        out_shape=jax.ShapeDtypeStruct((K, 1), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((K, K), jnp.float32)],
        interpret=interpret,
    )(
        boxes_sorted.astype(jnp.float32),
        valid_sorted.astype(jnp.int32)[:, None],
        thr,
    )
    return keep[:, 0] != 0


PALLAS_NMS_MAX_K = 1536  # (K, K) f32 scratch within VMEM budget
