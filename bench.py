#!/usr/bin/env python
"""Benchmark: WIDERFACE-L batch-1 1920x1080 end-to-end inference latency
on one TPU chip (bf16), INCLUDING on-device decode + NMS.

Baseline (BASELINE.md): the reference's RTX-2080Ti TensorRT FP16 number for
the same model/resolution is 7.66 ms/image — network-only (decode+NMS
excluded), so matching it end-to-end is strictly harder.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline < 1.0 means faster than the reference.
"""
import json
import sys

sys.path.insert(0, "/root/repo")

BASELINE_MS = 7.66  # README.md:64 — WIDERFACE-L FP16 @ 1920x1080


def main():
    import jax
    import numpy as np

    from lfdtpu.zoo import widerface_lfd
    from lfdtpu.deploy import compile_inference, make_device_preprocess, timing_inference

    det = widerface_lfd("L")
    variables = det.init(jax.random.PRNGKey(0), (256, 256))

    h, w = 1080, 1920
    divisor = max(det.point_strides)
    ph = (h + divisor - 1) // divisor * divisor
    pw = (w + divisor - 1) // divisor * divisor

    preprocess = make_device_preprocess((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    engine = compile_inference(
        det, variables, (ph, pw), precision="bf16", preprocess=preprocess
    )
    images = np.random.randint(0, 255, (1, ph, pw, 3), dtype=np.uint8)
    # honest async-backend timing: segments of enqueues closed by an
    # own-output fetch (true completion); median over segments. See
    # deploy/latency.timing_inference — block_until_ready alone returns at
    # enqueue on this backend and under-reports ~20x.
    r = timing_inference(engine, images, (h, w), warmup_loops=12)

    print(
        json.dumps(
            {
                "metric": "WIDERFACE-L bf16 batch-1 1920x1080 end-to-end (net+decode+NMS) latency",
                "value": round(r["ms_per_image"], 3),
                "unit": "ms/image",
                "vs_baseline": round(r["ms_per_image"] / BASELINE_MS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
