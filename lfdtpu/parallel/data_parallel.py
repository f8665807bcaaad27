# Data-parallel train/eval steps: one jitted program over a Mesh.
#
# Replaces the reference's DataParallel scatter/gather + host-side
# OptimizerHook backward/clip/step (`lfd/execution/executor.py:39,185-214`,
# `hooks/optimizer_hook.py:22-37`) with a single compiled function:
#   forward -> assign targets (on device) -> loss -> grad -> clip -> update
# Batches are sharded over the `data` mesh axis; since loss normalizers
# (num_pos) are global sums, XLA inserts the cross-replica psum — semantics
# are global-batch synchronous SGD (and sync-BN; the reference's per-GPU BN
# is a DataParallel artifact, noted per SURVEY.md §7 BatchNorm risk).

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..execution.optim import clip_by_global_norm, global_norm
from .mesh import batch_sharding, replicated_sharding


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(detector, optimizer, rng, input_hw, batch_size=1):
    variables = detector.init(rng, input_hw, batch_size=batch_size, train=True)
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(params),
    )


def make_train_step(
    detector,
    optimizer,
    input_hw,
    mesh=None,
    clip_max_norm: float = 0.0,
    donate: bool = True,
    remat: bool = False,
    preprocess=None,
    mixed_precision: bool = False,
):
    """Build the jitted data-parallel train step.

    Returns step(state, images, gt_bboxes, gt_labels, gt_mask, lr,
    clip_enabled) -> (state, metrics dict of scalars).

    preprocess: optional device-side fn(images) (e.g.
    deploy.make_device_preprocess) — lets the host ship raw uint8 batches
    (4x less PCIe/tunnel traffic than normalized f32).
    mixed_precision: run the conv net forward/backward in bf16 (f32 master
    weights, f32 loss/assignment/optimizer). bf16's 8-bit exponent needs no
    loss scaling. The reference has no equivalent (f32-only training).
    """
    input_hw = (int(input_hw[0]), int(input_hw[1]))

    def _cast_bf16(tree):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree,
        )
    # point-grid constants ride as step arguments — closing over them embeds
    # per-call-uploaded constants on the remote-TPU backend (measured ~30 ms)
    level_arrays = {
        k: jax.device_put(v) for k, v in detector.level_arrays(input_hw).items()
    }

    def _step(state, level_arrays, images, gt_bboxes, gt_labels, gt_mask, lr, clip_enabled):
        if preprocess is not None:
            images = preprocess(images)

        def loss_fn(params):
            fwd_params = _cast_bf16(params) if mixed_precision else params
            x = images.astype(jnp.bfloat16) if mixed_precision else images
            if remat:
                fwd = jax.checkpoint(
                    lambda v, im: detector.forward(v, im, train=True),
                    static_argnums=(),
                )
                outs, mutated = fwd(
                    {"params": fwd_params, "batch_stats": state.batch_stats}, x
                )
            else:
                outs, mutated = detector.forward(
                    {"params": fwd_params, "batch_stats": state.batch_stats},
                    x,
                    train=True,
                )
            if mixed_precision:
                outs = tuple(o.astype(jnp.float32) for o in outs)
            ld = detector.get_loss(
                outs, gt_bboxes, gt_labels, gt_mask, input_hw,
                level_arrays=level_arrays,
            )
            return ld["loss"], (mutated["batch_stats"], ld["loss_values"])

        (loss, (new_bs, loss_values)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        if mixed_precision:
            # keep running norm stats in their f32 master dtype
            new_bs = jax.tree.map(
                lambda t, s: s.astype(t.dtype), state.batch_stats, new_bs
            )

        if clip_max_norm > 0:
            grads, grad_norm = clip_by_global_norm(grads, clip_max_norm, clip_enabled)
        else:
            grad_norm = global_norm(grads)

        updates, new_opt = optimizer.update(grads, state.opt_state, state.params, lr)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = TrainState(new_params, new_bs, new_opt)
        metrics = dict(loss_values)
        metrics["grad_norm"] = grad_norm
        return new_state, metrics

    # explicit shardings only for real multi-device meshes: the GSPMD arg
    # path costs seconds per call on remote-attached single-chip backends
    # (measured 1.4 ms plain jit vs ~5 s with shardings at mesh size 1)
    if mesh is None or mesh.size == 1:
        jitted = jax.jit(_step, donate_argnums=(0,) if donate else ())
    else:
        bsh = batch_sharding(mesh)
        rep = replicated_sharding(mesh)
        jitted = jax.jit(
            _step,
            in_shardings=(rep, rep, bsh, bsh, bsh, bsh, rep, rep),
            out_shardings=(rep, rep),
            donate_argnums=(0,) if donate else (),
        )

    def step(state, images, gt_bboxes, gt_labels, gt_mask, lr, clip_enabled):
        return jitted(
            state, level_arrays, images, gt_bboxes, gt_labels, gt_mask, lr, clip_enabled
        )

    return step


def make_eval_step(detector, mesh=None, spatial=False):
    """Jitted batched forward for the val loop (dense outputs; per-image
    decode happens downstream).

    spatial=True additionally shards the image height over the mesh's
    `spatial` axis — the 4K-inference analogue of sequence parallelism
    (SURVEY.md §5): GSPMD inserts the conv halo exchanges over ICI."""

    def _fwd(state, images):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        return detector(variables, images, train=False)

    if mesh is None or mesh.size == 1:
        return jax.jit(_fwd)
    rep = replicated_sharding(mesh)
    if spatial:
        from .mesh import spatial_image_sharding

        ish = spatial_image_sharding(mesh)
        return jax.jit(_fwd, in_shardings=(rep, ish), out_shardings=batch_sharding(mesh))
    bsh = batch_sharding(mesh)
    return jax.jit(_fwd, in_shardings=(rep, bsh), out_shardings=bsh)
