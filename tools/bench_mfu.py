#!/usr/bin/env python
"""Measure latency + MXU MFU for one engine cell (fresh process).

MFU = model FLOPs / elapsed / chip peak. FLOPs come from XLA's own cost
analysis of the compiled engine (includes decode/NMS, which are
negligible next to the convs). Peaks (TPU v5e, per chip): 197 TFLOP/s
bf16/fp32(*via bf16 passes), 394 TOP/s int8.

Usage: python tools/bench_mfu.py WIDERFACE-L bf16 1080 1920 [loops]
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PEAK = {"fp32": 197e12, "bf16": 197e12, "int8": 394e12}


def main():
    model_name, precision = sys.argv[1], sys.argv[2]
    h, w = int(sys.argv[3]), int(sys.argv[4])
    loops = int(sys.argv[5]) if len(sys.argv) > 5 else 0

    import subprocess

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lfdtpu.deploy import (
        compile_inference,
        make_device_preprocess,
        timing_inference,
    )
    from lfdtpu.zoo import ZOO

    act_scales = None
    if precision == "int8":
        # calibrate in a separate process (foreign-output D2H would
        # degrade this process's timed calls — bench_cell.py docstring)
        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__),
                                          "calibrate_cell.py"),
             model_name, str(h), str(w)],
            capture_output=True, text=True, check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("AMAX ")][-1]
        act_scales = json.loads(line[len("AMAX "):])

    det = ZOO[model_name]()
    variables = det.init(jax.random.PRNGKey(0), (256, 256))

    divisor = max(det.point_strides)
    ph = (h + divisor - 1) // divisor * divisor
    pw = (w + divisor - 1) // divisor * divisor
    preprocess = make_device_preprocess((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    engine = compile_inference(
        det, variables, (ph, pw), precision=precision, preprocess=preprocess,
        act_scales=act_scales,
    )

    # FLOPs from XLA cost analysis of the compiled program (the inner jit
    # inlines into this outer lowering; compile-only, never executed, so it
    # cannot poison the timed engine's process)
    images = np.random.randint(0, 255, (1, ph, pw, 3), dtype=np.uint8)
    f = jax.jit(lambda im, vhw: engine(im, vhw))
    compiled = f.lower(jnp.asarray(images), jnp.asarray([h, w], jnp.float32)).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))

    r = timing_inference(engine, images, (h, w), warmup_loops=12, timing_loops=loops if loops else None)
    ms = r["ms_per_image"]
    mfu = flops / (ms / 1000.0) / PEAK[precision]
    r.update(model=model_name, precision=precision, height=h, width=w,
             flops=flops, mfu=mfu)
    print("MFU_RESULT " + json.dumps(r))
    print(f"{model_name} {precision} {w}x{h}: {ms:.3f} ms median, "
          f"{flops/1e9:.2f} GFLOP, MFU {mfu*100:.1f}%")


if __name__ == "__main__":
    main()
