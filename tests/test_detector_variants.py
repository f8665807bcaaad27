# LFDv2 / LFDv2Q / FCOS detector smoke tests: jitted loss + predict.
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lfdtpu.models import (
    FCOS, FCOSHead, LFDHead, LFDResNet, LFDv2, LFDv2Q, SimpleNeck,
)
from lfdtpu.ops.loss_wrappers import FocalLoss, GIoULoss, IoULoss, QualityFocalLoss

from tests.test_detector import _batch


def _tiny_parts(num_classes, cls_type, reg_type, head_cls=LFDHead):
    bb = LFDResNet(
        block_mode="fastest", stem_mode="fastest", body_mode=None,
        stem_channels=16, body_architecture=(1, 1), body_channels=(16, 32),
        out_indices=((0, 0), (1, 0)), norm_cfg=dict(type="BatchNorm2d"),
    )
    neck = SimpleNeck(num_neck_channels=32,
                      num_input_strides_list=tuple(bb.num_output_strides_list),
                      norm_cfg=dict(type="BatchNorm2d"))
    if head_cls is LFDHead:
        head = LFDHead(
            num_classes=num_classes, num_heads=2, num_head_channels=32,
            num_conv_layers=1, norm_cfg=None, share_head_flag=True,
            merge_path_flag=True, classification_loss_type=cls_type,
            regression_loss_type=reg_type,
        )
    else:
        head = FCOSHead(num_classes=num_classes, num_heads=2,
                        num_head_channels=32, num_layers=1, norm_cfg=None)
    return bb, neck, head


def _loss_of(det, n_outputs=2, rng=None):
    variables = det.init(jax.random.PRNGKey(0), (64, 64))
    images, gt, labels, mask = _batch(rng or np.random.RandomState(0))

    @jax.jit
    def loss_fn(variables):
        outs, mutated = det.forward(variables, jnp.asarray(images), train=True)
        return det.get_loss(
            outs, jnp.asarray(gt), jnp.asarray(labels), jnp.asarray(mask), (64, 64)
        )["loss"]

    return float(loss_fn(variables)), variables


def test_lfdv2_loss_and_predict(rng):
    bb, neck, head = _tiny_parts(1, "FocalLoss", "GIoULoss")
    det = LFDv2(backbone=bb, neck=neck, head=head, num_classes=1,
                regression_ranges=((0, 32), (32, 64)),
                point_strides=tuple(bb.num_output_strides_list),
                classification_loss_func=FocalLoss(),
                regression_loss_func=GIoULoss(),
                distance_to_bbox_mode="sigmoid")
    assert det.range_assign_mode == "longer"
    assert det.nms_threshold == 0.5
    loss, variables = _loss_of(det, rng=rng)
    assert np.isfinite(loss)
    res = det.predict_for_single_image(
        variables, (rng.rand(48, 64, 3) * 255).astype(np.uint8),
        classification_threshold=0.01,
    )
    assert isinstance(res, list)


def test_lfdv2q_coupled_loss(rng):
    bb, neck, head = _tiny_parts(2, "QualityFocalLoss", "IoULoss")
    det = LFDv2Q(backbone=bb, neck=neck, head=head, num_classes=2,
                 regression_ranges=((0, 32), (32, 64)),
                 point_strides=tuple(bb.num_output_strides_list),
                 classification_loss_func=QualityFocalLoss(),
                 regression_loss_func=IoULoss())
    loss, _ = _loss_of(det, rng=rng)
    assert np.isfinite(loss)


def test_fcos_loss_and_predict(rng):
    bb, neck, head = _tiny_parts(3, None, None, head_cls=FCOSHead)
    det = FCOS(backbone=bb, neck=neck, head=head, num_classes=3,
               regression_ranges=((0, 32), (32, 1e8)),
               point_strides=tuple(bb.num_output_strides_list),
               classification_loss_func=FocalLoss(),
               regression_loss_func=IoULoss())
    variables = det.init(jax.random.PRNGKey(0), (64, 64))
    images, gt, labels, mask = _batch(rng)
    labels = labels % 3

    @jax.jit
    def loss_fn(variables):
        outs, mutated = det.forward(variables, jnp.asarray(images), train=True)
        ld = det.get_loss(outs, jnp.asarray(gt), jnp.asarray(labels),
                          jnp.asarray(mask), (64, 64))
        return ld["loss"], ld["loss_values"]

    loss, lv = loss_fn(variables)
    assert np.isfinite(float(loss))
    assert "centerness_loss" in lv
    res = det.predict_for_single_image(
        variables, (rng.rand(48, 64, 3) * 255).astype(np.uint8),
        classification_threshold=0.01,
    )
    assert isinstance(res, list)
    for row in res:
        assert len(row) == 6


def test_fcosv1_multiclass_loss(rng):
    from lfdtpu.models import FCOSv1

    bb, neck, head = _tiny_parts(3, None, None, head_cls=FCOSHead)
    det = FCOSv1(backbone=bb, neck=neck, head=head, num_classes=3,
                 regression_ranges=((0, 32), (32, 1e8)),
                 point_strides=tuple(bb.num_output_strides_list),
                 classification_loss_func=FocalLoss(),
                 regression_loss_func=IoULoss())
    variables = det.init(jax.random.PRNGKey(0), (64, 64))
    images, gt, labels, mask = _batch(np.random.RandomState(3))
    # two overlapping boxes with different classes -> multi-label points
    gt[0, 1] = [12, 12, 24, 24]
    labels[0, 0], labels[0, 1] = 0, 2
    mask[0, 1] = True

    @jax.jit
    def loss_fn(variables):
        outs, _ = det.forward(variables, jnp.asarray(images), train=True)
        return det.get_loss(outs, jnp.asarray(gt), jnp.asarray(labels),
                            jnp.asarray(mask), (64, 64))["loss"]

    assert np.isfinite(float(loss_fn(variables)))


def test_grouped_sgd_bias_groups():
    from lfdtpu.execution.optim import GroupedSGD, bias_param_labels

    params = {
        "Conv_0": {"kernel": jnp.ones((3, 3, 4, 4)), "bias": jnp.ones((4,))},
        "BatchNorm_0": {"scale": jnp.ones((4,)), "bias": jnp.ones((4,))},
    }
    labels = bias_param_labels(params)
    assert labels["Conv_0"]["bias"] == "bias"
    assert labels["Conv_0"]["kernel"] == "other"
    assert labels["BatchNorm_0"]["bias"] == "other"  # norm bias excluded

    opt = GroupedSGD(learning_rate=0.1, momentum=0.0, weight_decay=0.0,
                     bias_lr=0.2)
    state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, state = opt.update(grads, state, params, 0.1)
    # bias group steps at 2x the lr
    np.testing.assert_allclose(np.asarray(updates["Conv_0"]["bias"]), -0.2)
    np.testing.assert_allclose(np.asarray(updates["Conv_0"]["kernel"]), -0.1)
    np.testing.assert_allclose(np.asarray(updates["BatchNorm_0"]["bias"]), -0.1)


def test_extreme_reg_logits_finite_loss_and_grad(rng):
    """Regression test: exp-mode decode must clamp before exp.

    Reg predictions at negative points carry zero weight in both loss
    terms, so training can drift them arbitrarily high; unclamped
    exp -> inf box coords -> IoU union inf-inf=NaN, and NaN*0 weight
    poisons the loss/grads (observed as a grad_norm NaN at epoch 12 of
    the lfdv2q synthetic run). The reference's pos-row gather
    (`lfdv2.py:1288-1309`) never evaluates those rows; the vectorized
    TPU formulation does, so it must be robust to them.
    """
    from lfdtpu.models import LFD

    _, gt, labels, mask = _batch(np.random.RandomState(0), C=2)

    def check(det):
        info = det.level_arrays((64, 64))
        n = info["points"].shape[0]
        cls_pred = jnp.full((2, n, 2), -5.0, jnp.float32)
        # +200 logits: e^200 overflows f32 without the clamp
        reg_pred = jnp.full((2, n, 4), 200.0, jnp.float32)

        def loss_fn(cls_p, reg_p):
            return det.get_loss(
                (cls_p, reg_p), jnp.asarray(gt), jnp.asarray(labels),
                jnp.asarray(mask), (64, 64),
            )["loss"]

        loss, grads = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))(
            cls_pred, reg_pred
        )
        assert np.isfinite(float(loss)), det.detector_name
        for g in grads:
            assert np.isfinite(np.asarray(g)).all(), det.detector_name

    bb, neck, head = _tiny_parts(2, "QualityFocalLoss", "IoULoss")
    check(LFDv2Q(backbone=bb, neck=neck, head=head, num_classes=2,
                 regression_ranges=((0, 32), (32, 64)),
                 point_strides=tuple(bb.num_output_strides_list),
                 classification_loss_func=QualityFocalLoss(),
                 regression_loss_func=IoULoss()))

    bb, neck, head = _tiny_parts(2, "FocalLoss", "GIoULoss")
    check(LFD(backbone=bb, neck=neck, head=head, num_classes=2,
              regression_ranges=((0, 32), (32, 64)),
              point_strides=tuple(bb.num_output_strides_list),
              classification_loss_func=FocalLoss(),
              regression_loss_func=GIoULoss(),
              distance_to_bbox_mode="exp"))
