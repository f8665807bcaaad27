from .sample import Sample, reserved_keys
from .jpeg import decode as jpeg_decode, encode as jpeg_encode, scale_with_quality, crop as jpeg_crop
from .parsers import Parser, WIDERFACEParser, COCOParser, TT100KParser, TT100K_TYPE45
from .dataset import Dataset
from .dataset_samplers import (
    BaseDatasetSampler,
    RandomDatasetSampler,
    COCORandomDatasetSampler,
    RandomWithNegDatasetSampler,
    ShardedDatasetSampler,
)
from .region_samplers import (
    BaseRegionSampler,
    TypicalCOCOTrainingRegionSampler,
    RandomBBoxCropRegionSampler,
    RandomBBoxCropWithRangeSelectionRegionSampler,
    IdleRegionSampler,
    crop_from_image,
)
from .augmentation import (
    Compose,
    HorizontalFlip,
    Normalize,
    BGR2RGB,
    caffe_imagenet_normalize,
    standard_normalize,
    simple_normalize,
    simple_widerface_train_pipeline,
    simple_widerface_val_pipeline,
    typical_coco_train_pipeline,
    typical_coco_val_pipeline,
)
from .device_aug import AUG_KEYS, DeviceAugRegionSampler, make_device_augment
from .loader import DataLoader, ShmDataLoader, pad_annotations
from .pack import (
    pack_widerface,
    pack_coco,
    pack_tt100k,
    pack_mini_for_debug,
    check_by_show,
)

__all__ = [
    "Sample", "reserved_keys",
    "Parser", "WIDERFACEParser", "COCOParser", "TT100KParser",
    "Dataset",
    "BaseDatasetSampler", "RandomDatasetSampler", "COCORandomDatasetSampler",
    "RandomWithNegDatasetSampler",
    "BaseRegionSampler", "TypicalCOCOTrainingRegionSampler",
    "RandomBBoxCropRegionSampler", "RandomBBoxCropWithRangeSelectionRegionSampler",
    "IdleRegionSampler", "crop_from_image",
    "Compose", "HorizontalFlip", "Normalize", "BGR2RGB",
    "caffe_imagenet_normalize", "standard_normalize", "simple_normalize",
    "simple_widerface_train_pipeline", "simple_widerface_val_pipeline",
    "typical_coco_train_pipeline", "typical_coco_val_pipeline",
    "AUG_KEYS", "DeviceAugRegionSampler", "make_device_augment",
    "DataLoader", "ShmDataLoader", "pad_annotations",
    "pack_widerface", "pack_coco", "pack_tt100k",
    "pack_mini_for_debug", "check_by_show",
]
