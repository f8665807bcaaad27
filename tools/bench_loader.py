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
    if loader_cls is not None and getattr(loader_cls, "__name__", "") == "ShmDataLoader" \
            and not device_aug:
        kw.setdefault("crop_size", 480)
    loader = loader_cls(
        ds, RandomDatasetSampler(ds, batch_size=16, seed=0),
        sampler,
        augmentation_pipeline=pipeline,
        num_workers=workers, max_boxes_per_image=8, **kw,
    )
    def consume(batch):
        # a consumer that never recycles slots starves ShmDataLoader's
        # fixed slot pool (the real consumer is prefetch_to_device, which
        # releases after device_put)
        if "_loader" in batch:
            batch["_loader"].release_slot(batch)

    try:
        it = iter(loader)
        consume(next(it))  # warmup (workers spin up)
        t0 = time.perf_counter()
        done = 1
        for batch in it:
            consume(batch)
            done += 1
            if done >= n_batches:
                break
        dt = time.perf_counter() - t0
    finally:
        close = getattr(loader, "close", None)
        if close:
            close()
    bps = (done - 1) / dt
    return dict(batches_per_s=bps, images_per_s=bps * 16)


VARIANTS = ("threaded", "process", "shm",
            # device-aug halves (data/device_aug.py): host does window-copy
            # + box math only; resample/flip/normalize move into the train
            # step (make_device_augment)
            "threaded-devaug", "shm-devaug")


def run_one(name, workers, n_batches):
    import functools

    from lfdtpu.data.loader import DataLoader, ShmDataLoader

    cls = {
        "threaded": DataLoader,
        "process": functools.partial(DataLoader, use_processes=True),
        "shm": ShmDataLoader,
        "threaded-devaug": DataLoader,
        "shm-devaug": ShmDataLoader,
    }[name]
    return bench(cls, workers, n_batches, device_aug=name.endswith("devaug"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--one", nargs=2, metavar=("VARIANT", "WORKERS"),
                    help="run a single (variant, workers) cell in-process")
    args = ap.parse_args()

    if args.one:
        name, workers = args.one[0], int(args.one[1])
        r = run_one(name, workers, args.batches)
        print("ONE_RESULT " + json.dumps(r))
        return

    results = {}
    print(f"nproc={os.cpu_count()}")
    # each cell in a FRESH subprocess: fork-based loaders deadlock when a
    # previous variant's worker threads are still alive in this process
    # (inherited queue locks), and a clean process also removes cross-
    # variant allocator/thread interference from the measurement
    import subprocess
    for name in VARIANTS:
        for workers in (1, 2, 4):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--batches", str(args.batches), "--one", name, str(workers)],
                capture_output=True, text=True, timeout=600,
            )
            r = None
            for line in out.stdout.splitlines():
                if line.startswith("ONE_RESULT "):
                    r = json.loads(line[len("ONE_RESULT "):])
            if r is None:
                tail = (out.stderr or out.stdout).strip().splitlines()
                r = dict(error=tail[-1][:120] if tail else "no output")
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
