# -*- coding: utf-8 -*-
# TrafficLight augmentation (reference `TrafficLight_train/
# TL_augmentation_pipeline.py`): BGR->RGB then standard imagenet
# normalization (models pretrained on RGB).
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from lfdtpu.data import BGR2RGB, Compose, HorizontalFlip, standard_normalize

tl_train_pipeline = Compose([HorizontalFlip(0.5), BGR2RGB(), standard_normalize])
tl_val_pipeline = Compose([BGR2RGB(), standard_normalize])
