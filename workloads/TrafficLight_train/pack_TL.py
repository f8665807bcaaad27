# -*- coding: utf-8 -*-
# Pack a COCO-format traffic-light dataset (reference
# `TrafficLight_train/pack_TL.py:2-19` — demonstrates COCOParser reuse for
# custom data).
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from lfdtpu.data import COCOParser, Dataset


def pack(coco_annotation_path, image_root,
         save_path="./TL_pack/tl_train.pkl"):
    parser = COCOParser(
        coco_annotation_path=coco_annotation_path,
        image_root=image_root,
        filter_no_gt=False,
        filter_min_size=32,
    )
    dataset = Dataset(parser=parser, save_path=save_path)
    print(dataset)
    return dataset


if __name__ == "__main__":
    pack(
        coco_annotation_path="./TL/annotations/train.json",
        image_root="./TL/images",
    )
