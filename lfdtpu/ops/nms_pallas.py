# Pallas TPU kernel for greedy-NMS suppression.
#
# TPU-native replacement for the reference's CUDA bitmask kernel
# (`nms/src/cuda/nms_kernel.cu:24-68`). The greedy recurrence
#   keep[j] = valid[j] & !any_{i<j}(keep[i] & iou[i,j] > thr)
# is solved by fixpoint sweeps where each sweep is ONE (1, K) x (K, K)
# matvec on the MXU over the suppression matrix held in VMEM — no HBM
# round-trips between sweeps, sweep count = suppression chain depth
# (typically 2-4). The pairwise-IoU suppression matrix is built by XLA
# (outer broadcasts fuse well there; Mosaic's layout rules dislike the
# lane-offset slicing it would need in-kernel).
#
# Boxes must arrive sorted by descending score; keep vectors are (1, K)
# f32 0/1 rows — Mosaic cannot carry i1 vectors through scf.while.

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PALLAS_NMS_MAX_K = 1536  # (K, K) f32 in VMEM within budget


def _fixpoint_kernel(sup_ref, valid_ref, keep_ref):
    sup = sup_ref[:]  # (K, K) f32 0/1: sup[i, j] -> kept i suppresses j
    valid = valid_ref[:]  # (1, K) f32 0/1

    def sweep(state):
        keep, _ = state
        suppressed = jnp.dot(keep, sup, preferred_element_type=jnp.float32)
        new_keep = valid * (suppressed <= 0.0).astype(jnp.float32)
        return new_keep, keep

    def not_converged(state):
        keep, prev = state
        return jnp.sum(jnp.abs(keep - prev)) > 0.0

    keep, _ = jax.lax.while_loop(
        not_converged, sweep, (valid, jnp.zeros_like(valid))
    )
    keep_ref[:] = keep


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
    b = boxes_sorted.astype(jnp.float32)
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    area = (x2 - x1) * (y2 - y1)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.clip(xx2 - xx1, 0, None) * jnp.clip(yy2 - yy1, 0, None)
    union = jnp.maximum(area[:, None] + area[None, :] - inter, 1e-12)
    iou = inter / union

    rows = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    valid_f = valid_sorted.astype(jnp.float32)
    sup = (
        (iou > iou_thr) & (rows < cols)
    ).astype(jnp.float32) * valid_f[:, None]

    keep = pl.pallas_call(
        _fixpoint_kernel,
        out_shape=jax.ShapeDtypeStruct((1, K), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(sup, valid_f[None, :])
    return keep[0] > 0.0
