# Device-side training augmentation (BASELINE.json north star: the
# reference's random crop/resize augmentation, `lfd/data_pipeline/
# data_loader/data_loader.py:48-85` + `sampler/region_sampler.py:75-144`,
# "fuses into a device-side jitted preprocessing stage").
#
# The host loader was MEASURED 4-11x slower than the device train step on
# this host (BENCH.md training section: 145-156 img/s fed vs 666-1,723
# consumed), and the bulk of its per-image cost is cv2.resize over the
# whole image plus the f32 normalize copy. This module moves the
# resample + flip + normalize into the jitted train step:
#
#   host   : decode JPEG, DRAW the exact reference augmentation parameters
#            (scale, crop offsets, flip) via the region samplers' draw()
#            methods, clip the boxes with the SAME _clip_boxes code path,
#            and memcpy the raw uint8 SOURCE WINDOW of the crop into a
#            fixed-size buffer. No cv2.resize of the full image, no float
#            conversion, no image flip.
#   device : one `jax.image.scale_and_translate` per image (two separable
#            matmuls -> MXU), lane-flip under the drawn flag, then the
#            usual mean/std normalize — all inside the jitted train step
#            via make_train_step(preprocess=...).
#
# Contract between the two halves: the device output pixel o equals the
# buffer sampled at  b = (o - translation) / scale  (half-pixel centers,
# bilinear, no antialiasing — cv2.resize's INTER_LINEAR convention). The
# host picks (scale, translation) so that this reproduces
# "cv2.resize(image, fx=s) then crop at (crop_x, crop_y)":
#     resized coord r = crop_x + o ; source coord  c = (r + 0.5)/s - 0.5
# and the buffer holds source pixels starting at src_x0, optionally
# pre-shrunk by f (<=1) when the source window exceeds the buffer:
#     b = (c - src_x0 + 0.5) * f - 0.5
# which is linear in o:  b = o * (f/s) + k  ->  scale = s/f,
# translation = -k * s/f  (computed per axis in _window below).
#
# The box math is bit-identical to the host path by construction (same
# draw() random stream, same _clip_boxes); only the image RESAMPLING
# differs from cv2 by <2/255 interior (fixed-point vs float bilinear) —
# pinned in tests/test_device_aug.py.

from __future__ import annotations

import math
import random

import cv2
import numpy as np

from .region_samplers import _clip_boxes

__all__ = ["DeviceAugRegionSampler", "make_device_augment", "AUG_KEYS"]

# batch keys the loader ships alongside the image buffer
AUG_KEYS = ("aug_scale", "aug_translation", "aug_flip")


class DeviceAugRegionSampler:
    """Host half: wraps a crop region sampler that exposes draw()
    (RandomBBoxCropRegionSampler / RandomBBoxCropWithRangeSelection...)
    and emits, per sample:

      image            (buffer_size, buffer_size, 3) uint8 — raw source
                       window of the crop (zero outside the image)
      aug_scale        (2,) f32 — device scale_and_translate scale (y, x)
      aug_translation  (2,) f32 — device translation (y, x)
      aug_flip         f32 — 1.0 if the device should mirror the crop
      bboxes/bbox_labels — already in OUTPUT-crop coords, flip applied
                       (exact reference math; boxes are cheap on host)

    buffer_size: source-window capacity. A window of crop_size/s + margin
    fits raw for s >= ~crop_size/buffer_size; smaller scales (the
    range-selection sampler shrinking large boxes) pre-shrink the window
    with cv2 ON THE WINDOW ONLY — still far less host work than the
    reference's full-image resize.
    """

    def __init__(self, region_sampler, buffer_size=None, flip_p=0.5, margin=4):
        draw = getattr(region_sampler, "draw", None)
        if draw is None:
            raise TypeError(
                f"{type(region_sampler).__name__} does not expose draw(); "
                "DeviceAugRegionSampler needs a RandomBBoxCrop-style sampler"
            )
        self._inner = region_sampler
        self._crop = int(region_sampler._crop_size)
        self._buffer = int(buffer_size or 2 * self._crop)
        assert self._buffer >= self._crop, (self._buffer, self._crop)
        self._flip_p = flip_p
        self._margin = int(margin)

    @property
    def crop_size(self):
        return self._crop

    @property
    def buffer_size(self):
        return self._buffer

    def _window(self, image, scale, crop_lo, axis):
        """One axis: choose the source window [src0, src1), fill factor f,
        and the device (scale, translation) reproducing resize+crop."""
        size = image.shape[axis]
        crop = self._crop
        # source coords touched by output pixels 0..crop-1 (bilinear taps
        # reach +-1 source px around the half-pixel-center map)
        c_lo = (crop_lo + 0.5) / scale - 0.5
        c_hi = (crop_lo + crop - 1 + 0.5) / scale - 0.5
        src0 = math.floor(c_lo) - self._margin
        src1 = math.ceil(c_hi) + self._margin + 1
        span = src1 - src0
        if span <= self._buffer:
            f = 1.0
        else:
            f = self._buffer / span
        return src0, src1, f

    def __call__(self, sample):
        assert "image" in sample
        image = sample["image"]
        if image.ndim == 2:  # gray -> 3ch before windowing (loader does
            image = np.repeat(image[..., None], 3, axis=-1)  # this later,
            # but the buffer copy needs the channel dim now)
        p = self._inner.draw(sample)
        crop = self._crop
        flip = random.random() < self._flip_p if self._flip_p > 0 else False

        # cv2.resize(fx=s) keeps the GIVEN s as the sampling ratio (it only
        # rounds the output SIZE, without recomputing the ratio from it —
        # unlike resize with an explicit dsize), so the device maps with
        # the drawn scale directly
        s_y = s_x = p["scale"]

        buf = np.zeros((self._buffer, self._buffer, 3), np.uint8)
        scale_yx = np.empty((2,), np.float32)
        trans_yx = np.empty((2,), np.float32)
        wins = []
        for axis, crop_lo, s in ((0, p["crop_y"], s_y), (1, p["crop_x"], s_x)):
            src0, src1, f = self._window(image, s, crop_lo, axis)
            wins.append((src0, src1, f))
        (sy0, sy1, fy), (sx0, sx1, fx) = wins
        # clip the window to the image; remember the in-buffer offset of
        # the clipped data so zero padding lands where the reference's
        # crop_from_image zero pad does
        iy0, iy1 = max(0, sy0), min(image.shape[0], sy1)
        ix0, ix1 = max(0, sx0), min(image.shape[1], sx1)
        patch = image[iy0:iy1, ix0:ix1]
        if patch.size:
            if fy < 1.0 or fx < 1.0:
                # pre-shrink ONLY the window (never the whole image);
                # rounding the placed size keeps the effective f exact
                ph = max(1, int(round(patch.shape[0] * fy)))
                pw = max(1, int(round(patch.shape[1] * fx)))
                fy2 = ph / patch.shape[0] if patch.shape[0] else 1.0
                fx2 = pw / patch.shape[1] if patch.shape[1] else 1.0
                patch = cv2.resize(patch, (pw, ph),
                                   interpolation=cv2.INTER_LINEAR)
                oy = int(round((iy0 - sy0) * fy2))
                ox = int(round((ix0 - sx0) * fx2))
                fy, fx = fy2, fx2
            else:
                oy, ox = iy0 - sy0, ix0 - sx0
            buf[oy:oy + patch.shape[0], ox:ox + patch.shape[1]] = patch
        for i, (crop_lo, s, src0, f) in enumerate(
                ((p["crop_y"], s_y, sy0, fy), (p["crop_x"], s_x, sx0, fx))):
            # target buffer coord per output pixel o:
            #   b(o) = ((crop_lo + o + 0.5)/s - 0.5 - src0 + 0.5)*f - 0.5
            #        = o*(f/s) + k
            # scale_and_translate samples b = (o + 0.5 - t)/scale - 0.5,
            # so scale = s/f and t = 0.5 - (k + 0.5)*(s/f)
            k = ((crop_lo + 0.5) / s - src0) * f - 0.5
            scale_yx[i] = s / f
            trans_yx[i] = 0.5 - (k + 0.5) * (s / f)

        boxes, labels = _clip_boxes(
            p["scaled_bboxes"], p["labels"], p["crop_x"], p["crop_y"], crop
        )
        if flip and boxes:
            boxes = [[crop - b[0] - b[2], b[1], b[2], b[3]] for b in boxes]
        sample["image"] = buf
        sample["aug_scale"] = scale_yx
        sample["aug_translation"] = trans_yx
        sample["aug_flip"] = np.float32(1.0 if flip else 0.0)
        if boxes:
            sample["bboxes"] = boxes
            sample["bbox_labels"] = labels
        else:
            sample.pop("bboxes", None)
            sample.pop("bbox_labels", None)
        return sample


def make_device_augment(crop_size, normalize=None, out_dtype=None,
                        compute_dtype=None):
    """Device half: a jittable preprocess for make_train_step.

    Takes the loader batch's images as a DICT pytree:
      {"buffer": (B, S, S, 3) uint8, "scale": (B, 2) f32,
       "translation": (B, 2) f32, "flip": (B,) f32}
    and returns the augmented, normalized (B, crop, crop, 3) float batch —
    resample (2 separable matmuls/image on the MXU), mirror, normalize,
    all fused into the train step's program.

    normalize: a deploy.make_device_preprocess-style fn (or None).
    compute_dtype: resample arithmetic dtype. Default f32 (exact parity
    with the host path's cv2 bilinear within fixed-point noise). bf16
    halves the resample's HBM traffic inside a mixed-precision train
    step — worst case ~1 uint8 LSB of extra rounding on the augmented
    pixels, irrelevant for training augmentation.
    """
    import jax
    import jax.numpy as jnp

    crop = int(crop_size)
    cdt = jnp.dtype(compute_dtype) if compute_dtype is not None else jnp.float32

    def _one(buf, scale, trans):
        # pixels in compute_dtype; scale/translation STAY f32 — the
        # sampling grid is coordinate-sensitive (bf16 coordinates cost
        # whole pixels of phase error at 480 px; bf16 pixel data costs
        # ~1 uint8 LSB)
        img = buf.astype(cdt)
        return jax.image.scale_and_translate(
            img, (crop, crop, 3), (0, 1), scale, trans,
            method="linear", antialias=False,
        )

    def augment(batch):
        out = jax.vmap(_one)(batch["buffer"], batch["scale"],
                             batch["translation"])
        flip = batch["flip"].reshape(-1, 1, 1, 1) > 0.5
        out = jnp.where(flip, out[:, :, ::-1], out)
        out = jnp.clip(out, 0.0, 255.0)
        if normalize is not None:
            out = normalize(out)
        if out_dtype is not None:
            out = out.astype(out_dtype)
        return out

    return augment
