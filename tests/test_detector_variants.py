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
