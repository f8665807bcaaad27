# -*- coding: utf-8 -*-
# Pack TT100K into a pickle dataset (reference `TT100K_train`'s
# pack via `lfd/data_pipeline/pack/pack_tt100k.py:10-28`).
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from lfdtpu.data import Dataset, TT100KParser


def pack(data_root, annotation_json_file_path, id_file_path,
         neg_image_root=None, save_path="./TT100K_pack/tt100k_train.pkl"):
    parser = TT100KParser(
        data_root=data_root,
        annotation_json_file_path=annotation_json_file_path,
        id_file_path=id_file_path,
        neg_image_root=neg_image_root,
    )
    dataset = Dataset(parser=parser, save_path=save_path)
    print(dataset)
    return dataset


if __name__ == "__main__":
    pack(
        data_root="./TT100K/data",
        annotation_json_file_path="./TT100K/data/annotations.json",
        id_file_path="./TT100K/data/train/ids.txt",
    )
