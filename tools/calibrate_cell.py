#!/usr/bin/env python
"""Calibrate int8 activation amax for one zoo model in its own process.

Prints one `AMAX {json}` line consumed by bench_cell.py. Runs as a
separate process because the amax fetch is a foreign-output D2H that would
permanently degrade the caller's per-call latency on the remote TPU
backend (see bench_cell.py docstring).

Usage: python tools/calibrate_cell.py WIDERFACE-L 1080 1920 [n_frames]
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    model_name = sys.argv[1]
    h, w = int(sys.argv[2]), int(sys.argv[3])
    n_frames = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    import numpy as np

    from bench_cell import build_cell
    from lfdtpu.deploy.int8_net import calibrate_module_amax

    det, variables, preprocess = build_cell(model_name)
    divisor = max(det.point_strides)
    ph = (h + divisor - 1) // divisor * divisor
    pw = (w + divisor - 1) // divisor * divisor

    rng = np.random.RandomState(0)
    frames = [
        rng.randint(0, 255, (1, ph, pw, 3), dtype=np.uint8)
        for _ in range(n_frames)
    ]
    amax = calibrate_module_amax(det, variables, frames, preprocess=preprocess)
    print("AMAX " + json.dumps(amax))


if __name__ == "__main__":
    main()
