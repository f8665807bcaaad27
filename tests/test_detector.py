# End-to-end detector tests: forward contract, jitted loss, one-batch
# overfit smoke (SURVEY.md §4 strategy), single-image predict.
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from lfdtpu.models import LFD, LFDResNet, SimpleNeck, LFDHead
from lfdtpu.ops.loss_wrappers import FocalLoss, IoULoss, SmoothL1Loss, CrossEntropyLoss


def tiny_lfd(num_classes=1, cls_loss=None, reg_loss=None, mode="sigmoid"):
    bb = LFDResNet(
        block_mode="fastest", stem_mode="fastest", body_mode=None,
        stem_channels=16, body_architecture=(1, 1), body_channels=(16, 32),
        out_indices=((0, 0), (1, 0)), norm_cfg=dict(type="BatchNorm2d"),
    )
    neck = SimpleNeck(num_neck_channels=32,
                      num_input_strides_list=tuple(bb.num_output_strides_list),
                      norm_cfg=dict(type="BatchNorm2d"))
    cls_loss = cls_loss or FocalLoss()
    reg_loss = reg_loss or IoULoss()
    head = LFDHead(
        num_classes=num_classes, num_heads=2, num_head_channels=32,
        num_conv_layers=1, norm_cfg=dict(type="GroupNorm", num_groups=8),
        share_head_flag=True, merge_path_flag=True,
        classification_loss_type=type(cls_loss).__name__,
        regression_loss_type=type(reg_loss).__name__,
    )
    return LFD(
        backbone=bb, neck=neck, head=head, num_classes=num_classes,
        regression_ranges=((0, 32), (32, 64)),
        point_strides=tuple(bb.num_output_strides_list),
        classification_loss_func=cls_loss, regression_loss_func=reg_loss,
        distance_to_bbox_mode=mode,
    )


def _batch(rng, B=2, H=64, W=64, nmax=4, C=1):
    images = rng.rand(B, H, W, 3).astype(np.float32)
    gt = np.zeros((B, nmax, 4), np.float32)
    labels = np.zeros((B, nmax), np.int32)
    mask = np.zeros((B, nmax), bool)
    gt[0, 0] = [10, 10, 20, 20]
    labels[0, 0] = 0
    mask[0, 0] = True
    gt[1, 0] = [30, 25, 16, 24]
    mask[1, 0] = True
    return images, gt, labels, mask


def test_forward_contract(rng):
    det = tiny_lfd()
    variables = det.init(jax.random.PRNGKey(0), (64, 64))
    images = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    (cls_o, reg_o), _ = det.forward(variables, images, train=False)
    P = det.num_points((64, 64))
    assert P == 8 * 8 + 4 * 4  # strides (8, 16) on 64x64
    assert cls_o.shape == (2, P, 1)
    assert reg_o.shape == (2, P, 4)


@pytest.mark.parametrize("cls_loss,reg_loss,mode", [
    (FocalLoss(), IoULoss(), "sigmoid"),
    (FocalLoss(), IoULoss(), "exp"),
    (CrossEntropyLoss(), SmoothL1Loss(), "exp"),
])
def test_loss_finite_and_jittable(rng, cls_loss, reg_loss, mode):
    det = tiny_lfd(cls_loss=cls_loss, reg_loss=reg_loss, mode=mode)
    variables = det.init(jax.random.PRNGKey(0), (64, 64))
    images, gt, labels, mask = _batch(rng)

    @jax.jit
    def loss_fn(variables, images, gt, labels, mask):
        outs, mutated = det.forward(variables, images, train=True)
        return det.get_loss(outs, gt, labels, mask, (64, 64))["loss"]

    l = loss_fn(variables, jnp.asarray(images), jnp.asarray(gt),
                jnp.asarray(labels), jnp.asarray(mask))
    assert np.isfinite(float(l))


def test_overfit_single_batch(rng):
    det = tiny_lfd()
    variables = det.init(jax.random.PRNGKey(0), (64, 64))
    images, gt, labels, mask = _batch(rng)
    images, gt, labels, mask = map(jnp.asarray, (images, gt, labels, mask))

    tx = optax.sgd(0.03, momentum=0.9)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state):
        def loss_fn(p):
            outs, mutated = det.forward(
                {"params": p, "batch_stats": batch_stats}, images, train=True
            )
            ld = det.get_loss(outs, gt, labels, mask, (64, 64))
            return ld["loss"], (mutated["batch_stats"], ld["loss_values"])

        (loss, (new_bs, lv)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, loss

    losses = []
    for i in range(40):
        params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, losses[::8]


def test_predict_for_single_image(rng):
    det = tiny_lfd()
    variables = det.init(jax.random.PRNGKey(0), (64, 64))
    image = (rng.rand(50, 70, 3) * 255).astype(np.uint8)
    results = det.predict_for_single_image(
        variables, image, classification_threshold=0.01, nms_threshold=0.5
    )
    assert isinstance(results, list)
    for row in results:
        assert len(row) == 6
        label, score, x, y, w, h = row
        assert isinstance(label, int)
        assert 0 <= score <= 1
        assert w >= 0 and h >= 0


def test_level_arrays_cache_not_poisoned_by_tracing(rng):
    # calling get_loss inside a user jit (level_arrays=None) must not cache
    # tracers that would break later eager predict calls
    det = tiny_lfd()
    variables = det.init(jax.random.PRNGKey(0), (64, 64))
    images, gt, labels, mask = _batch(rng)

    @jax.jit
    def loss_fn(v):
        outs, _ = det.forward(v, jnp.asarray(images), train=True)
        return det.get_loss(outs, jnp.asarray(gt), jnp.asarray(labels),
                            jnp.asarray(mask), (64, 64))["loss"]

    assert np.isfinite(float(loss_fn(variables)))
    # now the eager predict path must still work at the same resolution
    res = det.predict_for_single_image(
        variables, (rng.rand(64, 64, 3) * 255).astype(np.uint8),
        classification_threshold=0.01,
    )
    assert isinstance(res, list)
