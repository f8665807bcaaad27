from .points import (
    feature_map_sizes_for_input,
    generate_point_coordinates,
    concat_level_info,
)
from .boxes import (
    distance2bbox,
    bbox2distance,
    bbox_overlaps,
    xywh_to_xyxy,
    xyxy_to_xywh,
)
from .assign import lfd_assign, lfdv2_assign, fcos_assign
from .losses import (
    sigmoid_focal_loss,
    quality_focal_loss,
    distribution_focal_loss,
    iou_loss,
    giou_loss,
    diou_loss,
    ciou_loss,
    cross_entropy_loss,
    binary_cross_entropy_loss,
    smooth_l1_loss,
    l1_loss,
    mse_loss,
    weight_reduce_loss,
)
from .nms import nms, soft_nms, batched_nms_jax, multiclass_nms_jax, nms_mask
from .decode import decode_predictions, DecodeSpec

__all__ = [
    "feature_map_sizes_for_input",
    "generate_point_coordinates",
    "concat_level_info",
    "distance2bbox",
    "bbox2distance",
    "bbox_overlaps",
    "xywh_to_xyxy",
    "xyxy_to_xywh",
    "lfd_assign",
    "lfdv2_assign",
    "fcos_assign",
    "sigmoid_focal_loss",
    "quality_focal_loss",
    "distribution_focal_loss",
    "iou_loss",
    "giou_loss",
    "diou_loss",
    "ciou_loss",
    "cross_entropy_loss",
    "binary_cross_entropy_loss",
    "smooth_l1_loss",
    "l1_loss",
    "mse_loss",
    "weight_reduce_loss",
    "nms",
    "soft_nms",
    "batched_nms_jax",
    "multiclass_nms_jax",
    "nms_mask",
    "decode_predictions",
    "DecodeSpec",
]
