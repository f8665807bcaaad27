# -*- coding: utf-8 -*-
# TT100K augmentation (reference `TT100K_train/TT100K_augmentation_pipeline
# .py`): NO horizontal flip — traffic signs are not left-right symmetric —
# only simple normalization.
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from lfdtpu.data import Compose, simple_normalize

tt100k_train_pipeline = Compose([simple_normalize])
tt100k_val_pipeline = Compose([simple_normalize])
