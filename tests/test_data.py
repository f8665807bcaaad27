# Data pipeline tests: pack round-trip, samplers, region samplers (bbox
# re-clipping edge cases, `region_sampler.py:124-134`), augmentation,
# loader batch assembly + padded annotations (SURVEY.md §4 strategy).
import os
import pickle
import random

import numpy as np
import pytest

from lfdtpu.data import (
    BGR2RGB,
    COCORandomDatasetSampler,
    Compose,
    DataLoader,
    Dataset,
    HorizontalFlip,
    IdleRegionSampler,
    Normalize,
    RandomBBoxCropRegionSampler,
    RandomBBoxCropWithRangeSelectionRegionSampler,
    RandomDatasetSampler,
    RandomWithNegDatasetSampler,
    Sample,
    TypicalCOCOTrainingRegionSampler,
    crop_from_image,
    pad_annotations,
    simple_normalize,
)
from lfdtpu.data.parsers import Parser


class _ListParser(Parser):
    def __init__(self, samples, meta=None):
        self._samples = samples
        self._meta = meta

    def get_meta_info(self):
        return self._meta

    def generate_sample(self):
        yield from self._samples


def _make_samples(n=10, neg_every=4):
    rng = np.random.RandomState(0)
    out = []
    for i in range(n):
        s = Sample()
        s["image"] = (rng.rand(40 + i, 50 + i, 3) * 255).astype(np.uint8)
        s["original_height"] = 40 + i
        s["original_width"] = 50 + i if i % 2 == 0 else 30
        if i % neg_every != neg_every - 1:
            s["bboxes"] = [[5, 5, 10, 12], [20, 8, 8, 8]]
            s["bbox_labels"] = [0, 1]
        out.append(s)
    return out


def test_dataset_pack_roundtrip(tmp_path):
    path = str(tmp_path / "pack.pkl")
    ds = Dataset(parser=_ListParser(_make_samples(), meta={"k": 1}), save_path=path, verbose=False)
    assert len(ds) == 10
    ds2 = Dataset(load_path=path)
    assert len(ds2) == 10
    assert ds2.meta_info == {"k": 1}
    np.testing.assert_array_equal(ds2[0]["image"], ds[0]["image"])
    stats = ds2.get_dataset_statistics()
    assert "neg samples: 2" in stats  # i=3 and i=7 are neg (i%4==3)

    # schema parity: the pickle payload is [meta, {index: sample}] —
    # packs written by the reference load unchanged
    with open(path, "rb") as f:
        payload = pickle.load(f)
    assert isinstance(payload, list) and len(payload) == 2
    assert payload[0] == {"k": 1} and 0 in payload[1]


def test_random_dataset_sampler_covers_all():
    ds = Dataset(parser=_ListParser(_make_samples()), save_path="/tmp/_t1.pkl", verbose=False)
    s = RandomDatasetSampler(ds, batch_size=4, seed=0)
    batches = list(s)
    assert len(s) == 3
    assert all(len(b) == 4 for b in batches)  # final batch padded by wrap


def test_random_with_neg_sampler_ratio():
    ds = Dataset(parser=_ListParser(_make_samples(12)), save_path="/tmp/_t2.pkl", verbose=False)
    s = RandomWithNegDatasetSampler(ds, batch_size=4, neg_ratio=0.25, seed=0)
    neg_idx = {i for i in ds.get_indexes() if "bboxes" not in ds[i]}
    for batch in s:
        assert len(batch) == 4
        assert sum(1 for i in batch[-1:] if i in neg_idx) == 1  # 1 neg per batch


def test_coco_random_sampler_groups_by_aspect():
    ds = Dataset(parser=_ListParser(_make_samples(10)), save_path="/tmp/_t3.pkl", verbose=False)
    s = COCORandomDatasetSampler(ds, batch_size=2, seed=0)
    for batch in s:
        ratios = [int(ds[i]["original_width"] / ds[i]["original_height"] < 1) for i in batch]
        assert len(set(ratios)) == 1  # same group within a batch


def test_crop_from_image_out_of_bounds():
    img = np.arange(25, dtype=np.uint8).reshape(5, 5)
    # region partially outside -> zero padded (`region_sampler.py:280-300`)
    out = crop_from_image(img, (-2, -2, 5, 5))
    assert out.shape == (5, 5)
    assert out[0, 0] == 0 and out[2, 2] == img[0, 0]


def test_random_bbox_crop_fixed_size_and_clipping():
    random.seed(0)
    sampler = RandomBBoxCropRegionSampler(crop_size=48, resize_range=(1.0, 1.0), resize_prob=0.0)
    for _ in range(10):
        s = {"image": np.zeros((100, 120, 3), np.uint8),
             "bboxes": [[10, 10, 30, 30], [90, 80, 20, 15]],
             "bbox_labels": [0, 1]}
        s = sampler(s)
        assert s["image"].shape == (48, 48, 3)
        for b in s.get("bboxes", []):
            assert 0 <= b[0] < 48 and 0 <= b[1] < 48
            assert b[2] > 1 and b[3] > 1
            assert b[0] + b[2] <= 48 + 1 and b[1] + b[3] <= 48 + 1


def test_range_selection_sampler_scales_box_into_range():
    random.seed(1)
    ranges = ((4, 16), (16, 32))
    sampler = RandomBBoxCropWithRangeSelectionRegionSampler(
        crop_size=64, detection_ranges=ranges, range_mode="longer",
    )
    hits = 0
    for _ in range(20):
        s = {"image": np.zeros((200, 200, 3), np.uint8),
             "bboxes": [[50, 50, 64, 48]], "bbox_labels": [0]}
        s = sampler(s)
        assert s["image"].shape == (64, 64, 3)
        for b in s.get("bboxes", []):
            if 4 <= max(b[2], b[3]) <= 32 * 1.5:
                hits += 1
    assert hits >= 15  # vast majority land in (or near) the target ranges


def test_typical_coco_region_sampler_meta():
    random.seed(0)
    sampler = TypicalCOCOTrainingRegionSampler(resize_shorter_range=(100,), resize_longer_limit=200, pad_divisor=32)
    s = {"image": np.zeros((120, 240, 3), np.uint8), "bboxes": [[10, 10, 50, 50]]}
    s = sampler(s)
    assert s["image"].shape[0] % 32 == 0 and s["image"].shape[1] % 32 == 0
    assert "resize_scale" in s and "resized_height" in s


def test_horizontal_flip_bboxes():
    t = HorizontalFlip(p=1.0)
    img = np.zeros((10, 20, 3), np.uint8)
    img[:, :5] = 255
    s = {"image": img.copy(), "bboxes": [[2, 1, 4, 3]], "bbox_labels": [0]}
    s = t(s)
    assert s["bboxes"][0] == [20 - 2 - 4, 1, 4, 3]
    assert s["image"][:, -5:].all()


def test_normalizers():
    s = {"image": np.full((4, 4, 3), 255, np.uint8)}
    out = simple_normalize(dict(s))["image"]
    np.testing.assert_allclose(out, 1.0, atol=1e-6)
    s2 = {"image": np.zeros((2, 2, 3), np.float32)}
    bgr = BGR2RGB()
    s2["image"][..., 0] = 1.0
    assert bgr(s2)["image"][0, 0, 2] == 1.0


def test_pad_annotations():
    ann = [
        (np.asarray([[1, 2, 3, 4]], np.float32), np.asarray([2], np.int64)),
        (np.empty((0, 4), np.float32), np.empty((0,), np.int64)),
    ]
    gt, labels, mask = pad_annotations(ann, 3)
    assert gt.shape == (2, 3, 4)
    assert mask[0, 0] and not mask[0, 1] and not mask[1].any()
    assert labels[0, 0] == 2


def test_loader_end_to_end():
    ds = Dataset(parser=_ListParser(_make_samples(8)), save_path="/tmp/_t4.pkl", verbose=False)
    sampler = RandomWithNegDatasetSampler(ds, batch_size=4, neg_ratio=0.25, seed=0)
    region = RandomBBoxCropRegionSampler(crop_size=32, resize_prob=0.0)
    loader = DataLoader(ds, sampler, region,
                        augmentation_pipeline=Compose([simple_normalize]),
                        num_workers=2, max_boxes_per_image=8)
    n = 0
    for batch in loader:
        assert batch["images"].shape == (4, 32, 32, 3)
        assert batch["images"].dtype == np.float32
        assert batch["gt_bboxes"].shape == (4, 8, 4)
        assert batch["gt_mask"].shape == (4, 8)
        assert len(batch["annotations"]) == 4
        n += 1
    assert n == len(loader)


def test_loader_process_workers():
    ds = Dataset(parser=_ListParser(_make_samples(8)), save_path="/tmp/_t5.pkl", verbose=False)
    sampler = RandomDatasetSampler(ds, batch_size=4, seed=0)
    region = RandomBBoxCropRegionSampler(crop_size=32, resize_prob=0.0)
    loader = DataLoader(ds, sampler, region, num_workers=2,
                        max_boxes_per_image=8, use_processes=True,
                        image_dtype=np.uint8)
    n = 0
    for batch in loader:
        assert batch["images"].shape == (4, 32, 32, 3)
        assert batch["images"].dtype == np.uint8
        n += 1
    assert n == len(loader)


def test_shm_loader_batches_and_recycling():
    from lfdtpu.data import ShmDataLoader

    ds = Dataset(parser=_ListParser(_make_samples(8)), save_path="/tmp/_t6.pkl", verbose=False)
    sampler = RandomDatasetSampler(ds, batch_size=4, seed=0)
    region = RandomBBoxCropRegionSampler(crop_size=32, resize_prob=0.0)
    loader = ShmDataLoader(ds, sampler, region, num_workers=2,
                           max_boxes_per_image=8, crop_size=32)
    try:
        seen = 0
        for epoch in range(3):  # > num_slots batches total: slots recycle
            for batch in loader:
                assert batch["images"].shape == (4, 32, 32, 3)
                assert batch["gt_bboxes"].shape == (4, 8, 4)
                assert batch["gt_mask"].dtype == bool
                # consume then recycle like prefetch_to_device does
                _ = batch["images"].copy()
                loader.release_slot(batch)
                seen += 1
        assert seen == 3 * len(loader)
    finally:
        loader.close()


def test_jpeg_codec_roundtrips():
    """encode/scale_with_quality/crop parity surface (`turbojpeg.py:281-368`)."""
    import cv2

    from lfdtpu.data import jpeg_crop, jpeg_decode, jpeg_encode, scale_with_quality

    rng = np.random.RandomState(0)
    # smooth image so JPEG round-trip error stays small
    img = cv2.GaussianBlur(
        (rng.rand(64, 96, 3) * 255).astype(np.uint8), (15, 15), 5
    )
    buf = jpeg_encode(img, quality=95)
    back = jpeg_decode(buf)
    assert back.shape == img.shape
    assert np.abs(back.astype(int) - img.astype(int)).mean() < 8

    half = scale_with_quality(buf, scaling_factor=(1, 2), quality=90)
    scaled = jpeg_decode(half)
    assert scaled.shape[:2] == (32, 48)  # ceil(dim * 1/2)
    with pytest.raises(ValueError):
        scale_with_quality(buf, scaling_factor=(1, 3))

    # crop snaps x/y DOWN to the 16px MCU grid and extends the region
    cropped = jpeg_decode(jpeg_crop(buf, 20, 20, 32, 32))
    assert cropped.shape[:2] == (36, 36)  # snap 20->16, 32+4 extension
    gray = jpeg_decode(jpeg_crop(buf, 0, 0, 32, 32, gray=True))
    assert gray.ndim == 2
