"""Live-reference oracles for the HOST data pipeline: region samplers,
crop_from_image, and dataset (index) samplers.

The reference modules are loaded from their module FILES
(`/root/reference/lfd/data_pipeline/sampler/*.py`) so the
albumentations-dependent package __init__ is bypassed; they need only
math/random/numpy/cv2, all present.

Strategy: our samplers intentionally mirror the reference's RNG draw
ORDER (`lfdtpu/data/region_samplers.py`), so seeding `random` identically
must produce bit-identical crops/boxes/meta. This pins every rounding
convention (int-floor x/y, ceil w/h, the -1 re-clip, zero-padded
out-of-bounds crops) against the live reference rather than against
hand-derived golden values.

Known, documented divergences (asserted as such):
- range-selection with a 0-lower-bound range: the reference can draw
  target length 0 and crash in cv2.resize (region_sampler.py:212-214);
  ours clamps to >=1.
- the oversize-escape branch calls random.randint(0, upper*0.5) with a
  FLOAT upper bound, a TypeError on Python 3.12 (region_sampler.py:209);
  ours casts to int. Seeds that enter it are verified on our side only.
- RandomWithNegDatasetSampler draws negatives from numpy.random in the
  reference and from the sampler's own Random in ours, so only the
  positive rows are draw-parity; negative rows are checked structurally.
"""
import importlib.util
import math
import random

import numpy as np
import pytest

from lfdtpu.data.dataset_samplers import (
    COCORandomDatasetSampler,
    RandomDatasetSampler,
    RandomWithNegDatasetSampler,
)
from lfdtpu.data.region_samplers import (
    RandomBBoxCropRegionSampler,
    RandomBBoxCropWithRangeSelectionRegionSampler,
    TypicalCOCOTrainingRegionSampler,
    crop_from_image,
)

REF_SAMPLER_DIR = "/root/reference/lfd/data_pipeline/sampler"


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_rs():
    return _load("ref_region_sampler", f"{REF_SAMPLER_DIR}/region_sampler.py")


@pytest.fixture(scope="module")
def ref_ds():
    return _load("ref_dataset_sampler", f"{REF_SAMPLER_DIR}/dataset_sampler.py")


def _image(rng, h, w, c=3):
    shape = (h, w, c) if c else (h, w)
    return rng.integers(0, 255, shape, dtype=np.int64).astype(np.uint8)


def _sample(rng, h=220, w=300, boxes=((30, 40, 50, 60), (100, 10, 40, 25))):
    s = {"image": _image(rng, h, w)}
    if boxes:
        s["bboxes"] = [list(b) for b in boxes]
        s["bbox_labels"] = list(range(1, len(boxes) + 1))
    return s


def _assert_same_sample(ours, ref):
    assert np.array_equal(ours["image"], ref["image"])
    assert ("bboxes" in ours) == ("bboxes" in ref)
    if "bboxes" in ref:
        assert [list(map(int, b)) for b in ours["bboxes"]] == [
            list(map(int, b)) for b in ref["bboxes"]
        ]
        assert list(ours["bbox_labels"]) == list(ref["bbox_labels"])
    for k in ("resize_scale", "resized_height", "resized_width"):
        if k in ref:
            assert ours[k] == pytest.approx(ref[k])


def test_crop_from_image_matches_reference(ref_rs):
    rng = np.random.default_rng(0)
    im = _image(rng, 37, 53)
    # in-bounds, overhanging each/every edge, negative origin, exact fit
    regions = [(5, 7, 20, 10), (-9, -4, 30, 25), (40, 30, 40, 40),
               (-100, -100, 20, 20), (0, 0, 53, 37), (48, 30, 20, 20),
               (-6, 33, 70, 9)]
    for region in regions:
        assert np.array_equal(
            crop_from_image(im, region), ref_rs.crop_from_image(im, region)
        )
    gray = _image(rng, 31, 41, c=0)
    assert np.array_equal(
        crop_from_image(gray, (-3, 5, 50, 20)),
        ref_rs.crop_from_image(gray, (-3, 5, 50, 20)),
    )


def test_crop_fully_outside_image_documented_divergence(ref_rs):
    """A crop region lying entirely outside the image: the reference's
    slice arithmetic produces a negative stop that Python wraps, so it
    raises ValueError (region_sampler.py:297-298 — unreachable from its
    own samplers); ours returns the all-zeros crop."""
    rng = np.random.default_rng(4)
    im = _image(rng, 37, 53)
    for region in [(60, 5, 10, 50),      # fully right
                   (5, 40, 10, 30),      # fully below
                   (-40, 5, 20, 10),     # fully left
                   (5, -35, 10, 20)]:    # fully above
        ours = crop_from_image(im, region)
        assert ours.shape == (region[3], region[2], 3)
        assert not ours.any()
        with pytest.raises(ValueError):
            ref_rs.crop_from_image(im, region)


def test_typical_coco_sampler_matches_reference(ref_rs):
    rng = np.random.default_rng(1)
    for seed in range(8):
        for h, w in [(220, 300), (900, 500), (1500, 400)]:
            s_ours = _sample(rng, h, w)
            s_ref = {k: (v.copy() if hasattr(v, "copy") else list(v))
                     for k, v in s_ours.items()}
            ours = TypicalCOCOTrainingRegionSampler(
                resize_shorter_range=(600, 800), resize_longer_limit=1333)
            ref = ref_rs.TypicalCOCOTrainingRegionSampler(
                resize_shorter_range=(600, 800), resize_longer_limit=1333)
            random.seed(seed)
            out_ours = ours(s_ours)
            random.seed(seed)
            out_ref = ref(s_ref)
            _assert_same_sample(out_ours, out_ref)


def test_random_bbox_crop_matches_reference(ref_rs):
    rng = np.random.default_rng(2)
    cases = [
        dict(boxes=((30, 40, 50, 60), (100, 10, 40, 25), (5, 5, 200, 150))),
        dict(boxes=((0, 0, 299, 219),)),     # box covering the image
        dict(boxes=None),                     # negative sample
    ]
    for seed in range(10):
        for case in cases:
            s_ours = _sample(rng, boxes=case["boxes"])
            s_ref = {k: (v.copy() if hasattr(v, "copy") else list(v))
                     for k, v in s_ours.items()}
            ours = RandomBBoxCropRegionSampler(crop_size=128,
                                               resize_range=(0.5, 1.5),
                                               resize_prob=0.8)
            ref = ref_rs.RandomBBoxCropRegionSampler(crop_size=128,
                                                     resize_range=(0.5, 1.5),
                                                     resize_prob=0.8)
            random.seed(seed)
            out_ours = ours(s_ours)
            random.seed(seed)
            out_ref = ref(s_ref)
            _assert_same_sample(out_ours, out_ref)


def test_range_selection_sampler_matches_reference(ref_rs):
    """Exercises all four scale branches: <=lower (tiny box), lock
    (mid box + lock_threshold), >=upper (huge box), and the probed
    range-selection branch."""
    rng = np.random.default_rng(3)
    kw = dict(crop_size=256,
              detection_ranges=((4, 32), (32, 64), (64, 128), (128, 256)),
              range_mode="longer",
              range_selection_probs=(1, 2, 3, 4),
              lock_threshold=16)
    box_sets = [
        ((50, 60, 3, 3),),                   # side <= lower bound
        ((50, 60, 12, 9),),                  # lock branch
        ((10, 10, 80, 40), (120, 30, 20, 60)),  # range-selection branch
        ((2, 2, 280, 260),),                 # side >= upper: escape/probed
        None,                                # negative sample
    ]
    escaped = 0
    for seed in range(12):
        for boxes in box_sets:
            s_ours = _sample(rng, h=320, w=360, boxes=boxes)
            s_ref = {k: (v.copy() if hasattr(v, "copy") else list(v))
                     for k, v in s_ours.items()}
            random.seed(seed)
            out_ours = RandomBBoxCropWithRangeSelectionRegionSampler(**kw)(s_ours)
            random.seed(seed)
            try:
                out_ref = ref_rs.RandomBBoxCropWithRangeSelectionRegionSampler(
                    **kw)(s_ref)
            except TypeError:
                # reference's escape branch: random.randint(0, upper*0.5)
                # with a float bound — crashes on py3.12; ours casts. Our
                # output must still be a valid fixed-size crop.
                escaped += 1
                assert out_ours["image"].shape[:2] == (256, 256)
                continue
            _assert_same_sample(out_ours, out_ref)
    # the huge-box set must have hit the escape branch at least once,
    # otherwise this test silently stopped covering it
    assert escaped >= 1


class _FakeDataset:
    def __init__(self, metas):
        self._metas = metas

    def get_indexes(self):
        return list(range(len(self._metas)))

    def __getitem__(self, i):
        return self._metas[i]

    def __len__(self):
        return len(self._metas)


def test_random_dataset_sampler_matches_reference(ref_ds):
    # ignore_last=False is the only setting the reference's workloads use
    # (every `*_LFD_*.py` config passes ignore_last=False)
    metas = [{"bboxes": [[0, 0, 4, 4]]} for _ in range(11)]
    for seed in range(6):
        ours = RandomDatasetSampler(_FakeDataset(metas), batch_size=3,
                                    ragged_last=True, seed=seed)
        ref = ref_ds.RandomDatasetSampler(_FakeDataset(metas), batch_size=3)
        assert len(ours) == len(ref)
        random.seed(seed)
        assert [list(b) for b in ours] == [list(b) for b in ref]


def test_random_dataset_sampler_ignore_last_documented_divergence(ref_ds):
    """With ignore_last=True and n % batch_size != 0 the reference FOLDS
    the remainder into the final batch (dataset_sampler.py:50-54 slices
    `indexes[i*bs:]` at i == loops-1), yielding an OVERSIZED batch — a
    quirk no reference config exercises. Ours drops the tail instead
    (an oversized batch would retrigger jit compilation on TPU)."""
    metas = [{"bboxes": [[0, 0, 4, 4]]} for _ in range(11)]
    random.seed(0)
    ref_batches = [list(b) for b in ref_ds.RandomDatasetSampler(
        _FakeDataset(metas), batch_size=3, ignore_last=True)]
    assert [len(b) for b in ref_batches] == [3, 3, 5]
    ours = RandomDatasetSampler(_FakeDataset(metas), batch_size=3,
                                ignore_last=True, ragged_last=True, seed=0)
    ours_batches = [list(b) for b in ours]
    assert [len(b) for b in ours_batches] == [3, 3, 3]
    assert ours_batches == [b[:3] for b in ref_batches]


def test_coco_random_dataset_sampler_matches_reference(ref_ds):
    metas = (
        [{"original_width": 40, "original_height": 30}] * 7   # landscape
        + [{"original_width": 30, "original_height": 40}] * 5  # portrait
    )
    for seed in range(6):
        # Random(seed) and random.seed(seed) generate the same stream, and
        # both implementations draw (group padding, per-group shuffle,
        # batch shuffle) in the same order, so constructing+iterating each
        # against a fresh stream must agree batch-for-batch.
        ours = COCORandomDatasetSampler(_FakeDataset(metas), batch_size=2,
                                        seed=seed)
        ours_batches = [list(b) for b in ours]
        random.seed(seed)
        ref = ref_ds.COCORandomDatasetSampler(_FakeDataset(metas),
                                              batch_size=2)
        ref_batches = [list(b) for b in ref]
        assert len(ours) == len(ref)
        assert ours_batches == ref_batches


def test_random_with_neg_sampler_pos_rows_match_reference(ref_ds):
    metas = [{"bboxes": [[0, 0, 4, 4]]} for _ in range(9)]
    metas += [{} for _ in range(4)]  # negatives
    neg_set = set(range(9, 13))
    for seed in range(6):
        ours = RandomWithNegDatasetSampler(_FakeDataset(metas), batch_size=4,
                                           neg_ratio=0.25, ragged_last=True,
                                           seed=seed)
        ref = ref_ds.RandomWithNegDatasetSampler(_FakeDataset(metas),
                                                 batch_size=4, neg_ratio=0.25)
        assert len(ours) == len(ref)
        random.seed(seed)
        np.random.seed(seed)
        ref_batches = [list(b) for b in ref]
        ours_batches = [list(b) for b in ours]
        for bo, br in zip(ours_batches, ref_batches):
            # positives: same rows in the same order (shared shuffle draw);
            # negatives: reference uses numpy.random, ours its own Random —
            # structural check only
            assert bo[:3] == br[:3]
            assert all(i in neg_set for i in bo[3:])
            assert len(bo) == len(br) == 4
