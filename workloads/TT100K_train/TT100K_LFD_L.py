# -*- coding: utf-8 -*-
# TT100K LFD_L training entry point (reference
# `TT100K_train/TT100K_LFD_L.py`).
from _common import (
    prepare_common_settings,
    prepare_model,
    prepare_data_pipeline,
    prepare_optimizer,
    run,
)

memo = (
    "TT100K L: 45-class traffic signs, CrossEntropyLoss(+bg) + IoULoss, "
    "'longer' range mode, sigmoid distance-to-bbox, no flip aug"
)

config_dict = dict()


if __name__ == "__main__":
    prepare_common_settings(config_dict, __file__)
    prepare_model(config_dict, "L")
    prepare_data_pipeline(config_dict)
    prepare_optimizer(config_dict)
    run(config_dict)
