# -*- coding: utf-8 -*-
# WIDERFACE SIO offline evaluation (reference
# `WIDERFACE_train/evaluation.py`): per val image, class-agnostic predict at
# thr 0.01 / NMS 0.4, write per-event txt files for the matlab SIO tooling.
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from lfdtpu import zoo
from lfdtpu.evaluation import SIO_evaluation
from lfdtpu.execution import load_checkpoint


def run_SIO_evaluation(
    model_size="XS",
    param_file_path="./WIDERFACE_LFD_XS_work_dir/epoch_1000.ckpt",
    val_image_root="./WIDER_val/images",
    results_save_root="./WIDERFACE_evaluation/LFD_XS",
    classification_threshold=0.01,
    nms_threshold=0.4,
):
    model = zoo.widerface_lfd(model_size)
    state, _meta = load_checkpoint(param_file_path, strict=True)
    variables = {
        "params": state["params"],
        "batch_stats": state.get("batch_stats", {}),
    }
    SIO_evaluation(
        model=model,
        variables=variables,
        val_image_root=val_image_root,
        results_save_root=results_save_root,
        classification_threshold=classification_threshold,
        nms_threshold=nms_threshold,
    )


if __name__ == "__main__":
    run_SIO_evaluation()
