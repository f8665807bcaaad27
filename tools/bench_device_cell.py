#!/usr/bin/env python
"""Device-only time of ONE (model, precision, resolution) cell.

Prints one `DEVICE_RESULT {json}` line. Companion of bench_cell.py: the
wall-clock slope there includes the remote backend's fixed per-call
dispatch; the in-program loop here measures pure device execution
(deploy/latency.device_time_inference). A cell whose wall time loses to
the reference but whose device time beats it is tunnel-bound, not
program-bound — this is the per-cell evidence VERDICT r2 #3 asked for.

Usage: python tools/bench_device_cell.py WIDERFACE-L bf16 480 640
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import time

    t0 = time.time()
    model_name, precision = sys.argv[1], sys.argv[2]
    h, w = int(sys.argv[3]), int(sys.argv[4])

    import numpy as np

    from bench_cell import build_cell
    from lfdtpu.deploy import compile_inference
    from lfdtpu.deploy.latency import device_time_inference

    det, variables, preprocess = build_cell(model_name)
    divisor = max(det.point_strides)
    ph = (h + divisor - 1) // divisor * divisor
    pw = (w + divisor - 1) // divisor * divisor
    # engine-variant kwargs (approx_topk / int8_head_dtype / ...) via env,
    # same contract as bench_cell.py
    extra = json.loads(os.environ.get("LFD_BENCH_ENGINE_KWARGS", "{}"))
    engine = compile_inference(
        det, variables, (ph, pw), precision=precision, preprocess=preprocess,
        **extra,
    )
    images = np.random.randint(0, 255, (1, ph, pw, 3), dtype=np.uint8)
    t_build = time.time()
    r = device_time_inference(engine, images, (h, w))
    r.update(
        model=model_name, precision=precision, height=h, width=w,
        build_s=round(t_build - t0, 1), timing_s=round(time.time() - t_build, 1),
    )
    if extra:
        r["engine_kwargs"] = extra
    print("DEVICE_RESULT " + json.dumps(r))


if __name__ == "__main__":
    main()
