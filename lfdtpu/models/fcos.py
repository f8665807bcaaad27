# FCOS detector (reference `lfd/model/fcos.py:24-455`): hard one-hot labels
# with min-area disambiguation, a separate centerness branch trained with
# BCE, centerness-weighted IoU regression, and centerness-modulated NMS
# scores. The head applies Scale+exp internally, so decode uses 'direct'
# distances.

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import assign as assign_ops
from ..ops import boxes as box_ops
from ..ops import points as point_ops
from ..ops.decode import DecodeSpec, decode_predictions, detections_to_lists
from ..ops.losses import binary_cross_entropy_loss
from .detector import DetectionNet, pad_to_multiple


class FCOS:
    detector_name = "FCOS"

    def __init__(
        self,
        backbone=None,
        neck=None,
        head=None,
        num_classes=80,
        regression_ranges=((0, 64), (64, 128), (128, 256), (256, 512), (512, 100000)),
        point_strides=(8, 16, 32, 64, 128),
        classification_loss_func=None,
        regression_loss_func=None,
        classification_threshold=0.05,
        nms_threshold=0.5,
        pre_nms_bbox_limit=1000,
        post_nms_bbox_limit=100,
    ):
        assert len(regression_ranges) == len(point_strides)
        self.net = DetectionNet(backbone=backbone, neck=neck, head=head)
        self.backbone, self.neck, self.head = backbone, neck, head
        self.num_classes = num_classes
        self.regression_ranges = tuple(tuple(r) for r in regression_ranges)
        self.point_strides = tuple(int(s) for s in point_strides)
        self.num_heads = len(self.point_strides)
        self.classification_loss_func = classification_loss_func
        self.regression_loss_func = regression_loss_func
        self.classification_threshold = classification_threshold
        self.nms_threshold = nms_threshold
        self.pre_nms_bbox_limit = pre_nms_bbox_limit
        self.post_nms_bbox_limit = post_nms_bbox_limit
        self._predict_cache = {}
        # explicit per-instance caches (see LFD.__init__ on why not lru_cache)
        self._level_info_cache = {}
        self._level_array_cache = {}

    # ----------------------------------------------------------------- net
    def init(self, rng, input_hw=(256, 256), batch_size=1, train=True):
        x = jnp.zeros((batch_size, input_hw[0], input_hw[1], 3), jnp.float32)
        return self.net.init(rng, x, train=train)

    def forward(self, variables, images, train=False):
        if train:
            outs, mutated = self.net.apply(
                variables, images, train=True, mutable=["batch_stats"]
            )
            return outs, mutated
        return self.net.apply(variables, images, train=False), None

    def __call__(self, variables, images, train=False):
        return self.forward(variables, images, train=train)[0]

    def _level_info_np(self, input_hw):
        if input_hw not in self._level_info_cache:
            sizes = point_ops.feature_map_sizes_for_input(input_hw, self.point_strides)
            self._level_info_cache[input_hw] = point_ops.concat_level_info(
                sizes, self.point_strides, self.regression_ranges
            )
        return self._level_info_cache[input_hw]

    def level_info(self, input_hw):
        return self._level_info_np((int(input_hw[0]), int(input_hw[1])))

    def level_sizes(self, input_hw):
        """Static per-level point counts (h*w per level) for an input size."""
        sizes = point_ops.feature_map_sizes_for_input(
            (int(input_hw[0]), int(input_hw[1])), self.point_strides
        )
        return tuple(h * w for h, w in sizes)

    def level_arrays(self, input_hw):
        """Device-resident per-point constants; pass as jit args (see
        LFD.level_arrays on why closing over them is slow). Under an active
        trace, fresh constants are returned without caching (tracer-poison
        guard, see LFD.level_arrays)."""
        key = (int(input_hw[0]), int(input_hw[1]))
        try:
            tracing = not jax.core.trace_state_clean()
        except AttributeError:
            tracing = isinstance(jnp.zeros(()), jax.core.Tracer)
        if tracing:
            return {k: jnp.asarray(v) for k, v in self._level_info_np(key).items()}
        if key not in self._level_array_cache:
            self._level_array_cache[key] = {
                k: jnp.asarray(v) for k, v in self._level_info_np(key).items()
            }
        return self._level_array_cache[key]

    def num_points(self, input_hw):
        return self.level_info(input_hw)["points"].shape[0]

    # -------------------------------------------------------------- loss
    def get_loss(self, predict_outputs, gt_bboxes, gt_labels, gt_mask, input_hw,
                 level_arrays=None):
        """`lfd/model/fcos.py:243-330` with padded-GT masking.

        avg factors: cls = num_pos + batch_size; reg weighted by centerness
        targets with avg = centerness.sum(); centerness BCE mean over pos.
        """
        cls_pred, reg_pred, ctr_pred = predict_outputs
        B = cls_pred.shape[0]
        info = level_arrays if level_arrays is not None else self.level_arrays(input_hw)

        labels_t, reg_t = jax.vmap(
            lambda b, l, m: assign_ops.fcos_assign(
                info["points"], info["ranges"],
                b, l, m, self.num_classes,
            )
        )(gt_bboxes, gt_labels.astype(jnp.int32), gt_mask)

        cls_pred_f = cls_pred.reshape(-1, self.num_classes)
        reg_pred_f = reg_pred.reshape(-1, 4)
        ctr_pred_f = ctr_pred.reshape(-1)
        labels_f = labels_t.reshape(-1)
        reg_t_f = reg_t.reshape(-1, 4)

        pos = (labels_f != self.num_classes).astype(cls_pred_f.dtype)
        num_pos = jnp.sum(pos)

        classification_loss = self.classification_loss_func(
            cls_pred_f, labels_f.astype(jnp.int32), avg_factor=num_pos + B
        )

        ctr_t = assign_ops.centerness_target(reg_t_f) * pos
        points = jnp.tile(info["points"], (B, 1))
        # head already applied exp: distances are direct pixels
        pred_xyxy = box_ops.distance2bbox(points, reg_pred_f.astype(jnp.float32))
        target_xyxy = box_ops.distance2bbox(points, reg_t_f)
        regression_loss = self.regression_loss_func(
            pred_xyxy, target_xyxy, weight=ctr_t,
            avg_factor=jnp.maximum(jnp.sum(ctr_t), 1e-6),
        )
        centerness_loss = binary_cross_entropy_loss(
            ctr_pred_f[:, None], ctr_t[:, None], weight=pos[:, None],
            avg_factor=jnp.maximum(num_pos, 1.0),
        )

        loss = classification_loss + regression_loss + centerness_loss
        return dict(
            loss=loss,
            loss_values=dict(
                loss=loss,
                classification_loss=classification_loss,
                regression_loss=regression_loss,
                centerness_loss=centerness_loss,
                num_pos=num_pos,
            ),
        )

    # ------------------------------------------------------------ decode
    def decode_spec(self, classification_threshold=None, nms_threshold=None,
                    class_agnostic=False, max_det=None):
        return DecodeSpec(
            num_classes=self.num_classes,
            use_softmax=False,
            reg_mode="direct",
            score_thr=float(
                self.classification_threshold
                if classification_threshold is None
                else classification_threshold
            ),
            nms_iou=float(self.nms_threshold if nms_threshold is None else nms_threshold),
            pre_nms_points=self.pre_nms_bbox_limit,
            nms_budget=self.pre_nms_bbox_limit,
            max_det=self.post_nms_bbox_limit if max_det is None else max_det,
            class_agnostic=class_agnostic,
            # reference FCOS also applies pre_nms_bbox_limit per level, with
            # cls*centerness as the ranking score (`fcos.py:381-387`) — our
            # stage-1 probs already carry the centerness factor
            per_level_limit=int(self.pre_nms_bbox_limit),
        )

    def decode_single(self, outputs_single, input_hw, valid_hw, spec,
                      level_arrays=None):
        cls_o, reg_o, ctr_o = outputs_single
        info = level_arrays if level_arrays is not None else self.level_arrays(input_hw)
        points = info["points"]
        ranges = info["ranges"]
        h, w = valid_hw
        point_valid = (points[:, 0] < w) & (points[:, 1] < h)
        centerness = jax.nn.sigmoid(ctr_o[:, 0])
        return decode_predictions(
            cls_o, reg_o, points, ranges, spec, (h, w),
            point_valid=point_valid, score_factors=centerness,
            level_sizes=self.level_sizes(input_hw) if spec.per_level_limit > 0 else None,
        )

    def _batched_decode_jit(self, input_hw, spec, n_outputs=3):
        key = ("batched", input_hw, spec)
        if key not in self._predict_cache:

            @jax.jit
            def run(outputs, valid_hws, level_arrays):
                def dec(single, vhw):
                    return self.decode_single(
                        single, input_hw, (vhw[0], vhw[1]), spec,
                        level_arrays=level_arrays,
                    )

                return jax.vmap(dec)(outputs, valid_hws)

            self._predict_cache[key] = run
        return self._predict_cache[key]

    def results_from_outputs(self, outputs, input_hw, meta_batch, spec=None):
        """Batch of dense (cls, reg, ctr) outputs -> reference result rows;
        one jitted decode for the whole batch (shared with Executor.val)."""
        spec = spec or self.decode_spec()
        input_hw = (int(input_hw[0]), int(input_hw[1]))
        B = outputs[0].shape[0]
        valid_hws = np.asarray(
            [
                [
                    (meta_batch[i] or {}).get("resized_height", input_hw[0]),
                    (meta_batch[i] or {}).get("resized_width", input_hw[1]),
                ]
                for i in range(B)
            ],
            np.float32,
        )
        run = self._batched_decode_jit(input_hw, spec)
        decoded = run(outputs, jnp.asarray(valid_hws), self.level_arrays(input_hw))
        results = []
        for i in range(B):
            scale = (meta_batch[i] or {}).get("resize_scale", 1.0)
            single = {k: v[i] for k, v in decoded.items()}
            results.append(detections_to_lists(single, resize_scale=scale))
        return results

    def get_results(self, variables, images, meta_batch,
                    classification_threshold=None, nms_threshold=None):
        spec = self.decode_spec(classification_threshold, nms_threshold)
        input_hw = (int(images.shape[1]), int(images.shape[2]))
        outs = self.__call__(variables, images, train=False)
        return self.results_from_outputs(outs, input_hw, meta_batch, spec)

    def _predict_jit(self, input_hw, spec):
        key = (input_hw, spec)
        if key not in self._predict_cache:

            @jax.jit
            def run(variables, image, valid_hw, level_arrays):
                outs = self.net.apply(variables, image[None], train=False)
                return self.decode_single(
                    (outs[0][0], outs[1][0], outs[2][0]), input_hw,
                    (valid_hw[0], valid_hw[1]), spec, level_arrays=level_arrays,
                )

            self._predict_cache[key] = run
        return self._predict_cache[key]

    def predict_for_single_image(
        self,
        variables,
        image,
        aug_pipeline=None,
        classification_threshold=None,
        nms_threshold=None,
        class_agnostic=False,
        size_divisor=None,
    ):
        import cv2

        if isinstance(image, str):
            image = cv2.imread(image, cv2.IMREAD_UNCHANGED)
            assert image is not None
        if aug_pipeline is not None:
            from ..data.sample import Sample

            sample = Sample()
            sample["image"] = image
            image = aug_pipeline(sample)["image"]
        image = np.asarray(image, dtype=np.float32)
        if image.ndim == 2:
            image = np.tile(image[..., None], (1, 1, 3))
        h, w = image.shape[:2]
        divisor = size_divisor or max(self.point_strides)
        padded = pad_to_multiple(image, divisor)
        spec = self.decode_spec(
            classification_threshold, nms_threshold, class_agnostic=class_agnostic
        )
        input_hw = tuple(int(v) for v in padded.shape[:2])
        run = self._predict_jit(input_hw, spec)
        decoded = run(variables, jnp.asarray(padded), jnp.asarray([h, w], jnp.float32),
                      self.level_arrays(input_hw))
        return detections_to_lists(decoded)


class FCOSv1(FCOS):
    """Experimental multi-class-per-point FCOS (`lfd/model/fcos.py:452-795`):
    classification becomes P*C independent binary problems — predictions
    reshape to (P*C, 1) and each (point, class) pair gets a binary
    focal-loss target (fg if any valid GT of that class covers the point).
    Regression/centerness follow FCOS on the min-area GT."""

    detector_name = "FCOSv1"

    def get_loss(self, predict_outputs, gt_bboxes, gt_labels, gt_mask, input_hw,
                 level_arrays=None):
        cls_pred, reg_pred, ctr_pred = predict_outputs
        B = cls_pred.shape[0]
        info = level_arrays if level_arrays is not None else self.level_arrays(input_hw)

        fg_t, reg_t = jax.vmap(
            lambda b, l, m: assign_ops.fcos_v1_assign(
                info["points"], info["ranges"], b, l, m, self.num_classes,
            )
        )(gt_bboxes, gt_labels.astype(jnp.int32), gt_mask)

        fg_f = fg_t.reshape(-1, self.num_classes)  # (B*P, C) bool
        reg_pred_f = reg_pred.reshape(-1, 4)
        ctr_pred_f = ctr_pred.reshape(-1)
        reg_t_f = reg_t.reshape(-1, 4)

        pos = jnp.any(fg_f, axis=-1).astype(jnp.float32)  # point positive
        num_pos = jnp.sum(pos)

        # each (point, class) is a binary problem: FL over (B*P*C, 1) logits
        # with label 0 = foreground, 1 (== num_classes of the binary view)
        # = background (`fcos.py:711-739`)
        bin_logits = cls_pred.reshape(-1, 1)
        bin_labels = jnp.where(fg_f.reshape(-1), 0, 1).astype(jnp.int32)
        classification_loss = self.classification_loss_func(
            bin_logits, bin_labels, avg_factor=num_pos + B
        )

        ctr_t = assign_ops.centerness_target(reg_t_f) * pos
        points = jnp.tile(info["points"], (B, 1))
        pred_xyxy = box_ops.distance2bbox(points, reg_pred_f.astype(jnp.float32))
        target_xyxy = box_ops.distance2bbox(points, reg_t_f)
        regression_loss = self.regression_loss_func(
            pred_xyxy, target_xyxy, weight=ctr_t,
            avg_factor=jnp.maximum(jnp.sum(ctr_t), 1e-6),
        )
        centerness_loss = binary_cross_entropy_loss(
            ctr_pred_f[:, None], ctr_t[:, None], weight=pos[:, None],
            avg_factor=jnp.maximum(num_pos, 1.0),
        )

        loss = classification_loss + regression_loss + centerness_loss
        return dict(
            loss=loss,
            loss_values=dict(
                loss=loss,
                classification_loss=classification_loss,
                regression_loss=regression_loss,
                centerness_loss=centerness_loss,
                num_pos=num_pos,
            ),
        )
