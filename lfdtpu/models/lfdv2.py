# LFDv2 detector family (reference `lfd/model/lfdv2.py:134-1652`).
#
# LFDv2 shares LFD's loss plumbing (the get_loss body at `lfdv2.py:444-560`
# is line-identical to v1's); only the assignment differs: FCOS-style
# centerness scores with a stride-sized "core zone" forced to 1.0 and a
# linear gray-zone relaxation multiplier instead of hard ignores
# (`lfdv2.py:281-418`). Defaults change to range_assign_mode='longer',
# nms_threshold=0.5, plus per-level pre-NMS top-k and a post-NMS cap
# (`lfdv2.py:618-624,665`).
#
# LFDv2Q is the file's second, experimental class `LFDv2_`
# (`lfdv2.py:963-1652`): QualityFocalLoss-only classification where positive
# quality targets are optionally coupled with the IoU between decoded
# (detached) predictions and targets (`lfdv2.py:1296-1318`).

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops import assign as assign_ops
from ..ops import boxes as box_ops
from .detector import LFD


class LFDv2(LFD):
    detector_name = "LFDv2"

    def __init__(
        self,
        backbone=None,
        neck=None,
        head=None,
        num_classes=80,
        regression_ranges=((0, 64), (64, 128), (128, 256), (256, 512), (512, 1024)),
        gray_range_factors=(0.9, 1.1),
        range_assign_mode="longer",
        point_strides=(8, 16, 32, 64, 128),
        classification_loss_func=None,
        regression_loss_func=None,
        distance_to_bbox_mode="exp",
        enable_classification_weight=False,
        enable_regression_weight=False,
        classification_threshold=0.05,
        nms_threshold=0.5,
        pre_nms_bbox_limit=1000,
        post_nms_bbox_limit=100,
    ):
        super().__init__(
            backbone=backbone,
            neck=neck,
            head=head,
            num_classes=num_classes,
            regression_ranges=regression_ranges,
            gray_range_factors=gray_range_factors,
            range_assign_mode=range_assign_mode,
            point_strides=point_strides,
            classification_loss_func=classification_loss_func,
            regression_loss_func=regression_loss_func,
            distance_to_bbox_mode=distance_to_bbox_mode,
            enable_classification_weight=enable_classification_weight,
            enable_regression_weight=enable_regression_weight,
            classification_threshold=classification_threshold,
            nms_threshold=nms_threshold,
            pre_nms_bbox_limit=pre_nms_bbox_limit,
            post_nms_bbox_limit=post_nms_bbox_limit,
        )

    def decode_spec(self, classification_threshold=None, nms_threshold=None,
                    class_agnostic=False, max_det=None):
        """LFDv2 applies pre_nms_bbox_limit PER LEVEL before concat
        (`lfdv2.py:618-624`), unlike v1's global candidate budget."""
        spec = super().decode_spec(
            classification_threshold, nms_threshold, class_agnostic, max_det
        )
        return dataclasses.replace(
            spec, per_level_limit=int(self.pre_nms_bbox_limit)
        )

    def _assign_single(self, info, gt_bboxes, gt_labels, gt_mask):
        return assign_ops.lfdv2_assign(
            info["points"],
            info["strides"],
            info["ranges"],
            info["gray_ranges"],
            gt_bboxes,
            gt_labels,
            gt_mask,
            self.num_classes,
            range_assign_mode=self.range_assign_mode,
            normalize_by_range=self.regression_loss_type == "independent",
        )


class LFDv2Q(LFDv2):
    """`LFDv2_` (`lfdv2.py:963-1652`): QFL-only classification with optional
    IoU-quality coupling; regression weighted by the detached predicted
    class score; 'exp' decode only."""

    detector_name = "LFDv2Q"

    def __init__(self, *args, enable_iou_score_coupling=True, **kwargs):
        kwargs.setdefault("distance_to_bbox_mode", "exp")
        super().__init__(*args, **kwargs)
        assert self.classification_loss_type == "QualityFocalLoss", (
            "LFDv2Q requires QualityFocalLoss (`lfdv2.py:1013-1015`)"
        )
        assert self.regression_loss_type == "union"
        self.enable_iou_score_coupling = enable_iou_score_coupling

    def get_loss(self, predict_outputs, gt_bboxes, gt_labels, gt_mask, input_hw,
                 level_arrays=None):
        """`lfdv2.py:1254-1328` with padded-GT masking."""
        cls_pred, reg_pred = predict_outputs
        B = cls_pred.shape[0]
        info = level_arrays if level_arrays is not None else self.level_arrays(input_hw)

        cls_t, reg_t = jax.vmap(
            lambda b, l, m: self._assign_single(info, b, l, m)
        )(gt_bboxes, gt_labels.astype(jnp.int32), gt_mask)

        cls_pred_f = cls_pred.reshape(-1, self.num_classes)
        reg_pred_f = reg_pred.reshape(-1, 4)
        cls_t_f = cls_t.reshape(-1, self.num_classes)
        reg_t_f = reg_t.reshape(-1, 4)

        max_scores = jnp.max(cls_t_f, axis=-1)
        max_idx = jnp.argmax(cls_t_f, axis=-1).astype(jnp.int32)
        pos = (max_scores > 0).astype(cls_pred_f.dtype)

        points = jnp.tile(info["points"], (B, 1))
        # clamp before exp: reg predictions at negative points carry zero
        # weight in BOTH loss terms, so nothing stops them drifting until
        # exp overflows to inf — then bbox_overlaps yields inf-inf=NaN and
        # `iou * pos` (NaN*0=NaN) poisons score_targets (the reference only
        # gathers pos rows, `lfdv2.py:1288-1309`, so it never sees these)
        dist = jnp.exp(jnp.minimum(reg_pred_f.astype(jnp.float32), 30.0))
        pred_xyxy = box_ops.distance2bbox(points, dist)
        target_xyxy = box_ops.distance2bbox(points, reg_t_f)

        # regression weighted by detached predicted class probability at the
        # target class (`lfdv2.py:1300-1306`)
        probs = jax.lax.stop_gradient(jax.nn.sigmoid(cls_pred_f))
        reg_w = jnp.take_along_axis(probs, max_idx[:, None], axis=1)[:, 0] * pos
        reg_denorm = jnp.maximum(jnp.sum(reg_w), 1.0)
        regression_loss = self.regression_loss_func(
            pred_xyxy, target_xyxy, weight=reg_w, avg_factor=reg_denorm
        )

        iou = box_ops.bbox_overlaps(
            jax.lax.stop_gradient(pred_xyxy), target_xyxy, is_aligned=True
        )
        iou_score = iou * pos
        score_targets = max_scores * iou_score if self.enable_iou_score_coupling else max_scores

        cls_denorm = jnp.maximum(jnp.sum(score_targets), 1.0)
        labels = jnp.where(score_targets > 0, max_idx, self.num_classes).astype(jnp.int32)
        classification_loss = self.classification_loss_func(
            cls_pred_f, (labels, score_targets), avg_factor=cls_denorm
        )

        loss = classification_loss + regression_loss
        return dict(
            loss=loss,
            loss_values=dict(
                loss=loss,
                classification_loss=classification_loss,
                regression_loss=regression_loss,
                num_pos=jnp.sum(pos),
            ),
        )
