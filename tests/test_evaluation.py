# Evaluation tests: numpy COCO mAP sanity, TT100K matcher, SIO writer.
import json
import os

import numpy as np

from lfdtpu.evaluation import COCOEvaluator, coco_map, tt100k_eval, results_to_tt100k_annos


def test_coco_map_perfect_predictions():
    gt = {(1, 1): ([[10, 10, 40, 40]], [False]),
          (2, 1): ([[5, 5, 20, 20], [100, 100, 50, 50]], [False, False])}
    det = {(1, 1): ([[10, 10, 40, 40]], [0.9]),
           (2, 1): ([[5, 5, 20, 20], [100, 100, 50, 50]], [0.8, 0.95])}
    m = coco_map(gt, det, [1])
    assert m["mAP"] > 0.99
    assert m["mAP_50"] > 0.99


def test_coco_map_false_positive_penalty():
    gt = {(1, 1): ([[10, 10, 40, 40]], [False])}
    # one perfect, one high-scoring FP above it
    det = {(1, 1): ([[10, 10, 40, 40], [200, 200, 40, 40]], [0.8, 0.95])}
    m = coco_map(gt, det, [1])
    assert 0.4 < m["mAP_50"] < 0.75  # precision halved at the FP


def test_coco_map_localization_threshold():
    gt = {(1, 1): ([[10, 10, 40, 40]], [False])}
    # IoU 0.625 box: counts at 0.5 but not at 0.75
    det = {(1, 1): ([[10, 10, 25, 40]], [0.9])}
    m = coco_map(gt, det, [1])
    assert m["mAP_50"] > 0.99
    assert m["mAP_75"] < 0.01


def test_coco_map_crowd_ignored():
    gt = {(1, 1): ([[10, 10, 40, 40], [100, 100, 80, 80]], [False, True])}
    det = {(1, 1): ([[10, 10, 40, 40], [100, 100, 80, 80]], [0.9, 0.8])}
    m = coco_map(gt, det, [1])
    # crowd GT not counted; det matching it is ignored, not a FP
    assert m["mAP"] > 0.99


def test_coco_evaluator_streaming(tmp_path):
    ann = {
        "images": [{"id": 1, "height": 100, "width": 100, "file_name": "a.jpg"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 7, "bbox": [10, 10, 40, 40],
             "iscrowd": 0, "area": 1600},
        ],
        "categories": [{"id": 7, "name": "thing"}],
    }
    path = str(tmp_path / "ann.json")
    with open(path, "w") as f:
        json.dump(ann, f)
    ev = COCOEvaluator(path, {0: 7})
    # reference row format: [label, score, x, y, w, h]
    ev.update(([[[0, 0.9, 10, 10, 40, 40]]], [{"image_id": 1}]))
    ev.evaluate()
    s = ev.get_eval_display_str()
    assert "mAP" in s
    assert ev.metrics["mAP"] > 0.99


def _tt_obj(cat, x1, y1, x2, y2, score=None):
    o = dict(category=cat, bbox=dict(xmin=x1, ymin=y1, xmax=x2, ymax=y2))
    if score is not None:
        o["score"] = score
    return o


def test_tt100k_eval_basic():
    gt = {"imgs": {"1": {"objects": [_tt_obj("pn", 10, 10, 50, 50),
                                     _tt_obj("i2", 100, 100, 140, 140)]}}}
    rt = {"imgs": {"1": {"objects": [_tt_obj("pn", 12, 11, 49, 52, score=95),
                                     _tt_obj("i2", 200, 200, 240, 240, score=99)]}}}
    s = tt100k_eval(gt, rt, iou=0.5, types=["pn", "i2"], minscore=90)
    assert s["accuracy"] == 0.5  # 1 of 2 dets correct
    assert s["recall"] == 0.5  # 1 of 2 gts found


def test_tt100k_minscore_filter():
    gt = {"imgs": {"1": {"objects": [_tt_obj("pn", 10, 10, 50, 50)]}}}
    rt = {"imgs": {"1": {"objects": [_tt_obj("pn", 10, 10, 50, 50, score=50)]}}}
    s = tt100k_eval(gt, rt, iou=0.5, minscore=90)
    assert s["recall"] == 0.0  # low-score det excluded entirely
    assert s["accuracy"] == 1.0  # no counted dets -> 1 by convention


def test_tt100k_size_window():
    gt = {"imgs": {"1": {"objects": [_tt_obj("pn", 0, 0, 500, 500)]}}}
    rt = {"imgs": {"1": {"objects": [_tt_obj("pn", 0, 0, 500, 500, score=99)]}}}
    s = tt100k_eval(gt, rt, iou=0.5, minscore=90, maxboxsize=400)
    # both outside [0, 400) window -> excluded from counts
    assert s["accuracy"] == 1.0 and s["recall"] == 1.0


def test_results_to_tt100k_annos():
    per_image = {"7": [[0, 0.93, 10.0, 20.0, 30.0, 40.0]]}
    annos = results_to_tt100k_annos(per_image, {0: "pn"})
    obj = annos["imgs"]["7"]["objects"][0]
    assert obj["category"] == "pn"
    assert abs(obj["score"] - 93.0) < 1e-6
    assert obj["bbox"]["xmax"] == 40.0


def test_sio_writer(tmp_path):
    # writer formatting without a real model: fake predict via a stub
    from lfdtpu.evaluation import SIO_evaluation

    class StubModel:
        def predict_for_single_image(self, variables, image, **kw):
            return [[0, 0.9, 10.2, 20.8, 30.4, 40.6]]

    img_dir = tmp_path / "val" / "event_a"
    img_dir.mkdir(parents=True)
    import cv2

    cv2.imwrite(str(img_dir / "pic.jpg"), np.zeros((10, 10, 3), np.uint8))
    n = SIO_evaluation(
        StubModel(), None, str(tmp_path / "val"), str(tmp_path / "out"),
        aug_pipeline=False, verbose=False,
    )
    assert n == 1
    out = (tmp_path / "out" / "event_a" / "pic.txt").read_text().splitlines()
    assert out[0] == "pic"
    assert out[1] == "2"  # count includes dummy row
    assert out[2] == "0 0 0 0 0.001"
    assert out[3] == "10 20 31 41 0.900"  # floor x/y, ceil w/h
