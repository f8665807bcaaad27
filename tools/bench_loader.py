#!/usr/bin/env python
"""Loader-only throughput microbench across worker counts and variants.

Substantiates (or bounds) the ShmDataLoader scaling claim from BENCH.md:
feeds a synthetic in-memory dataset through each loader variant at 1/2/4
workers and reports batches/s and images/s — no device work at all.

On this container (nproc=1) every variant serializes on the single core,
so the numbers here are a lower bound; the tool exists so a multi-core
host can demonstrate the scaling directly.

Usage: python tools/bench_loader.py [--batches N]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


class MemDataset:
    def __init__(self, n=256, size=480):
        rng = np.random.RandomState(0)
        self._s = {
            i: {
                "image": (rng.rand(size, size, 3) * 255).astype(np.uint8),
                "bboxes": [[20, 20, 60, 60]],
                "bbox_labels": [0],
            }
            for i in range(n)
        }

    def __getitem__(self, i):
        return self._s[i]

    def __len__(self):
        return len(self._s)

    def get_indexes(self):
        return list(self._s.keys())


def bench(loader_cls, workers, n_batches, device_aug=False, **kw):
    from lfdtpu.data import (
        Compose, DeviceAugRegionSampler, RandomBBoxCropRegionSampler,
        RandomDatasetSampler, simple_normalize,
    )

    ds = MemDataset()
    sampler = RandomBBoxCropRegionSampler(
        crop_size=480, resize_range=(0.8, 1.25), resize_prob=0.5)
    if device_aug:
        # device-aug contract: the host only windows the raw uint8 source
        # (no cv2.resize of the image, no flip, no f32 normalize) — those
        # run inside the jitted train step via make_device_augment. The
        # buffer is capped at crop/0.8+margin so H2D bytes stay close to
        # the host path's f32 crop (608^2*3 u8 = 1.1 MB vs 480^2*3 f32 =
        # 2.8 MB per image).
        sampler = DeviceAugRegionSampler(sampler, buffer_size=616)
        pipeline = None
    else:
        pipeline = Compose([simple_normalize])
    if device_aug:
        kw.setdefault("image_dtype", np.uint8)
    loader = loader_cls(
        ds, RandomDatasetSampler(ds, batch_size=16, seed=0),
        sampler,
        augmentation_pipeline=pipeline,
        num_workers=workers, max_boxes_per_image=8, **kw,
    )
    it = iter(loader)
    next(it)  # warmup (workers spin up)
    t0 = time.perf_counter()
    done = 1
    for batch in it:
        done += 1
        if done >= n_batches:
            break
    dt = time.perf_counter() - t0
    bps = (done - 1) / dt
    return dict(batches_per_s=bps, images_per_s=bps * 16)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=12)
    args = ap.parse_args()

    import functools

    from lfdtpu.data.loader import DataLoader, ShmDataLoader

    results = {}
    print(f"nproc={os.cpu_count()}")
    variants = [
        ("threaded", DataLoader, False),
        ("process", functools.partial(DataLoader, use_processes=True), False),
        ("shm", ShmDataLoader, False),
        # device-aug halves (data/device_aug.py): host does window-copy +
        # box math only; resample/flip/normalize move into the train step
        ("threaded-devaug", DataLoader, True),
        ("shm-devaug", ShmDataLoader, True),
    ]
    for name, cls, devaug in variants:
        for workers in (1, 2, 4):
            try:
                r = bench(cls, workers, args.batches, device_aug=devaug)
            except Exception as e:
                r = dict(error=f"{type(e).__name__}: {e}")
            results[f"{name}-w{workers}"] = r
            msg = (f"{r['images_per_s']:.1f} img/s"
                   if "images_per_s" in r else r["error"][:80])
            print(f"{name:9s} workers={workers}: {msg}", flush=True)
    print(json.dumps(results, indent=1))
    # campaign-cell contract: one marker line with the flat summary
    print("LOADER_RESULT " + json.dumps(dict(
        nproc=os.cpu_count(),
        **{k: round(v["images_per_s"], 1) for k, v in results.items()
           if "images_per_s" in v},
    )))


if __name__ == "__main__":
    main()
