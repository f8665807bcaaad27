"""Device-side augmentation (data/device_aug.py) vs the host path.

The host half reuses the region samplers' draw() + _clip_boxes, so with a
shared random seed the BOX math must be bit-identical to the host sampler;
the IMAGE must match cv2's resize+crop within bilinear fixed-point noise
away from zero-pad borders. The device half runs under jit (CPU here) and
through make_train_step's preprocess hook.
"""
import random

import cv2
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from lfdtpu.data import (
    DataLoader,
    DeviceAugRegionSampler,
    RandomBBoxCropRegionSampler,
    RandomBBoxCropWithRangeSelectionRegionSampler,
    RandomDatasetSampler,
    make_device_augment,
)


def _scene(h=300, w=420, seed=0):
    rng = np.random.RandomState(seed)
    # smooth image: bilinear implementation differences stay sub-LSB on
    # smooth content, so the comparison threshold can be tight
    base = rng.rand(h // 10 + 2, w // 10 + 2, 3) * 255
    img = cv2.resize(base.astype(np.float32), (w, h)).astype(np.uint8)
    return img


def _sample(img, boxes, labels):
    return dict(image=img.copy(), bboxes=[list(b) for b in boxes],
                bbox_labels=list(labels))


def _run_device(sampler, sample):
    out = sampler(dict(sample))
    aug = make_device_augment(sampler.crop_size)
    batch = {
        "buffer": jnp.asarray(out["image"])[None],
        "scale": jnp.asarray(out["aug_scale"])[None],
        "translation": jnp.asarray(out["aug_translation"])[None],
        "flip": jnp.asarray(out["aug_flip"])[None],
    }
    img = np.asarray(jax.jit(aug)(batch))[0]
    return out, img


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_boxes_match_host_sampler_exactly(seed):
    img = _scene()
    boxes = [[30, 40, 60, 50], [200, 100, 80, 90], [350, 220, 40, 30]]
    sampler_host = RandomBBoxCropRegionSampler(crop_size=160, resize_range=(0.5, 1.5))
    sampler_dev = DeviceAugRegionSampler(
        RandomBBoxCropRegionSampler(crop_size=160, resize_range=(0.5, 1.5)),
        flip_p=0.0,
    )
    random.seed(seed)
    host = sampler_host(_sample(img, boxes, [0, 1, 2]))
    random.seed(seed)
    dev = sampler_dev(_sample(img, boxes, [0, 1, 2]))
    assert host.get("bboxes") == dev.get("bboxes")
    assert host.get("bbox_labels") == dev.get("bbox_labels")


@pytest.mark.parametrize("seed", list(range(6)))
def test_image_matches_host_resample(seed):
    img = _scene()
    boxes = [[30, 40, 60, 50], [200, 100, 80, 90]]
    mk = lambda: RandomBBoxCropRegionSampler(crop_size=160, resize_range=(0.6, 1.4))
    random.seed(seed)
    host = mk()(_sample(img, boxes, [0, 1]))
    random.seed(seed)
    dev_s = DeviceAugRegionSampler(mk(), flip_p=0.0)
    _, dev_img = _run_device(dev_s, _sample(img, boxes, [0, 1]))
    h = host["image"].astype(np.float32)
    d = dev_img
    # compare away from the crop's zero-pad border (bilinear blends with
    # zeros differently within 1px of the pad boundary)
    nz = (h.sum(-1) > 0)
    interior = cv2.erode(nz.astype(np.uint8), np.ones((5, 5), np.uint8)) > 0
    if interior.sum() == 0:
        pytest.skip("crop landed fully in padding for this seed")
    diff = np.abs(h - d)[interior]
    assert np.median(diff) <= 1.0, np.median(diff)
    assert (diff <= 3.0).mean() > 0.99, diff.max()


def test_range_selection_small_scale_prescaled_window():
    """A big box forced into a small range -> scale << 1 -> the source
    window exceeds the buffer and the host pre-shrinks it (an extra
    bilinear pass vs the reference's single resize — on textured content
    the two sparse sampling patterns legitimately differ, which is fine
    for augmentation). Bilinear chains are EXACT on affine images, so a
    ramp pins the pre-shrink COORDINATE math against the host path."""
    y, x = np.mgrid[0:500, 0:500]
    img = np.stack([(0.3 * x + 0.2 * y) % 256,
                    (0.25 * x + 0.1 * y) % 256,
                    np.full_like(x, 80)], -1).astype(np.uint8)
    # keep the ramp un-wrapped inside the sampled region: use offsets that
    # stay below 255 over 500 px
    img = np.stack([(0.2 * x + 0.15 * y) + 10,
                    (0.15 * x + 0.2 * y) + 5,
                    np.full_like(x, 80.0)], -1).astype(np.uint8)
    boxes = [[50, 60, 380, 350]]
    mk = lambda: RandomBBoxCropWithRangeSelectionRegionSampler(
        crop_size=160, detection_ranges=((4, 16), (16, 64)),
        range_mode="longer",
    )
    checked = 0
    for seed in range(6):
        random.seed(seed)
        drawn = mk().draw(_sample(img, boxes, [0]))
        if 160 / drawn["scale"] + 10 <= 320:
            continue  # want only pre-shrunk (source window > buffer) draws
        random.seed(seed)
        host = mk()(_sample(img, boxes, [0]))
        random.seed(seed)
        dev_s = DeviceAugRegionSampler(mk(), flip_p=0.0)
        out, dev_img = _run_device(dev_s, _sample(img, boxes, [0]))
        h = host["image"].astype(np.float32)
        nz = (h.sum(-1) > 0)
        interior = cv2.erode(nz.astype(np.uint8), np.ones((7, 7), np.uint8)) > 0
        if interior.sum() < 1000:
            # extreme downscales leave a content blob of a few px where
            # zero-pad edge blending (which legitimately differs from the
            # reference's clamped full-image resize) dominates — skip
            continue
        diff = np.abs(h - dev_img)[interior]
        # tolerance = uint8 rounding of the intermediate shrunk window,
        # amplified by the device upsample
        assert np.median(diff) <= 2.0, (seed, np.median(diff))
        checked += 1
    assert checked >= 1


def test_flip_flag_flips_image_and_boxes():
    img = _scene()
    boxes = [[30, 40, 60, 50]]
    mk = lambda: RandomBBoxCropRegionSampler(crop_size=160, resize_range=(1.0, 1.0), resize_prob=0.0)
    random.seed(0)
    noflip_s = DeviceAugRegionSampler(mk(), flip_p=0.0)
    out0, img0 = _run_device(noflip_s, _sample(img, boxes, [0]))
    random.seed(0)
    flip_s = DeviceAugRegionSampler(mk(), flip_p=1.0)
    out1, img1 = _run_device(flip_s, _sample(img, boxes, [0]))
    assert out1["aug_flip"] == 1.0
    np.testing.assert_allclose(img1, img0[:, ::-1], atol=1e-3)
    b0, b1 = out0["bboxes"][0], out1["bboxes"][0]
    assert b1 == [160 - b0[0] - b0[2], b0[1], b0[2], b0[3]]


def test_gray_image_tiles_to_3ch():
    img = _scene()[..., 0]  # (H, W) gray
    s = DeviceAugRegionSampler(
        RandomBBoxCropRegionSampler(crop_size=96, resize_range=(0.8, 1.2)),
        flip_p=0.5,
    )
    random.seed(1)
    out = s(_sample(img, [[30, 40, 50, 50]], [0]))
    assert out["image"].shape == (192, 192, 3)
    assert (out["image"][..., 0] == out["image"][..., 1]).all()


def test_loader_ships_aug_arrays_and_train_step_consumes():
    """End-to-end: DataLoader with a DeviceAugRegionSampler emits the aug
    arrays; make_train_step(preprocess=make_device_augment(...)) takes the
    images pytree and trains one step."""
    from lfdtpu.models.lfd_resnet import LFDResNet
    from lfdtpu.models.necks import SimpleNeck
    from lfdtpu.models.heads import LFDHead
    from lfdtpu.models.detector import LFD
    from lfdtpu.ops.loss_wrappers import FocalLoss, IoULoss
    from lfdtpu.execution.optim import SGD
    from lfdtpu.parallel.data_parallel import create_train_state, make_train_step
    from lfdtpu.deploy import make_device_preprocess

    crop = 64
    ds = {
        i: dict(image=_scene(120, 140, seed=i),
                bboxes=[[20 + i, 25, 40, 35]], bbox_labels=[0])
        for i in range(8)
    }
    ds_obj = type("DS", (), {
        "__getitem__": lambda self, i: ds[i],
        "__len__": lambda self: len(ds),
        "get_indexes": lambda self: list(ds.keys()),
    })()
    sampler = DeviceAugRegionSampler(
        RandomBBoxCropRegionSampler(crop_size=crop, resize_range=(0.8, 1.2)),
        flip_p=0.5,
    )
    loader = DataLoader(
        ds_obj, RandomDatasetSampler(ds_obj, batch_size=4, seed=0), sampler,
        num_workers=1, max_boxes_per_image=4, image_dtype=np.uint8,
    )
    batch = next(iter(loader))
    assert batch["images"].shape == (4, 2 * crop, 2 * crop, 3)
    assert batch["aug_scale"].shape == (4, 2)
    assert batch["aug_translation"].shape == (4, 2)
    assert batch["aug_flip"].shape == (4,)
    assert batch["images"].dtype == np.uint8

    backbone = LFDResNet(block_mode="faster", stem_mode="faster",
                         body_mode=None, stem_channels=16,
                         body_architecture=(1,), body_channels=(16,),
                         out_indices=((0, 0),),
                         norm_cfg=dict(type="BatchNorm2d"))
    neck = SimpleNeck(num_neck_channels=16,
                      num_input_strides_list=tuple(backbone.num_output_strides_list),
                      norm_cfg=dict(type="BatchNorm2d"))
    head = LFDHead(num_classes=1, num_heads=1, num_head_channels=16,
                   num_conv_layers=1,
                   norm_cfg=dict(type="GroupNorm", num_groups=4),
                   classification_loss_type="FocalLoss",
                   regression_loss_type="IoULoss")
    det = LFD(backbone=backbone, neck=neck, head=head, num_classes=1,
              regression_ranges=((0, 64),),
              point_strides=tuple(backbone.num_output_strides_list),
              classification_loss_func=FocalLoss(),
              regression_loss_func=IoULoss(),
              distance_to_bbox_mode="sigmoid")
    opt = SGD(momentum=0.9, weight_decay=1e-4)
    state = create_train_state(det, opt, jax.random.PRNGKey(0), (crop, crop),
                               batch_size=4)
    aug = make_device_augment(
        crop, normalize=make_device_preprocess((0.5, 0.5, 0.5), (0.5, 0.5, 0.5)))
    step = make_train_step(det, opt, (crop, crop), preprocess=aug)
    images = dict(buffer=batch["images"], scale=batch["aug_scale"],
                  translation=batch["aug_translation"], flip=batch["aug_flip"])
    state, metrics = step(state, images, batch["gt_bboxes"],
                          batch["gt_labels"], batch["gt_mask"],
                          np.float32(0.01), np.bool_(False))
    assert np.isfinite(float(metrics["loss"]))


def test_shm_loader_aug_slots():
    from lfdtpu.data.loader import ShmDataLoader

    crop = 64
    ds = {
        i: dict(image=_scene(120, 140, seed=i),
                bboxes=[[20, 25, 40, 35]], bbox_labels=[0])
        for i in range(8)
    }
    ds_obj = type("DS", (), {
        "__getitem__": lambda self, i: ds[i],
        "__len__": lambda self: len(ds),
        "get_indexes": lambda self: list(ds.keys()),
    })()
    sampler = DeviceAugRegionSampler(
        RandomBBoxCropRegionSampler(crop_size=crop, resize_range=(0.8, 1.2)),
        flip_p=0.5,
    )
    loader = ShmDataLoader(
        ds_obj, RandomDatasetSampler(ds_obj, batch_size=4, seed=0), sampler,
        num_workers=1, max_boxes_per_image=4,
    )
    try:
        batch = next(iter(loader))
        assert batch["images"].shape == (4, 2 * crop, 2 * crop, 3)
        assert batch["aug_scale"].shape == (4, 2)
        assert batch["aug_flip"].shape == (4,)
        assert np.isfinite(batch["aug_scale"]).all()
        loader.release_slot(batch)
    finally:
        loader.close()


def test_bf16_compute_dtype_close_to_f32():
    """compute_dtype='bfloat16' (the HBM-halving mixed-precision option)
    must stay within ~1 uint8 LSB of the f32 resample on smooth content."""
    img = _scene()
    s = DeviceAugRegionSampler(
        RandomBBoxCropRegionSampler(crop_size=96, resize_range=(0.7, 1.3)),
        flip_p=0.0,
    )
    random.seed(2)
    out = s(_sample(img, [[30, 40, 60, 50]], [0]))
    batch = {
        "buffer": jnp.asarray(out["image"])[None],
        "scale": jnp.asarray(out["aug_scale"])[None],
        "translation": jnp.asarray(out["aug_translation"])[None],
        "flip": jnp.asarray(out["aug_flip"])[None],
    }
    a32 = np.asarray(jax.jit(make_device_augment(96))(batch))[0]
    a16 = np.asarray(
        jax.jit(make_device_augment(96, compute_dtype="bfloat16"))(batch)
    )[0].astype(np.float32)
    diff = np.abs(a32 - a16)
    assert np.median(diff) <= 1.0, np.median(diff)
    assert diff.max() <= 3.0, diff.max()
