# Latency measurement (reference `lfd/deployment/tensorrt/
# inference_latency_evaluation.py:19-127` — `timing_engine`).
#
# Same protocol: warmup loops (compile excluded) then N timed loops with a
# device sync per loop (`block_until_ready` ≙ cuda stream synchronize);
# prints ms/image and FPS. Unlike the reference, the engine timed here
# includes on-device decode + NMS (the TRT numbers exclude them).

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timing_inference(engine, images, valid_hw, warmup_loops=10, timing_loops=100,
                     distinct_inputs=8):
    """Time a compiled engine. Returns per-loop robust statistics.

    Methodology (each point needed for trustworthy numbers on a
    remote-attached backend, BENCH.md):
      - rotates over `distinct_inputs` pre-uploaded input variants so
        runtimes that memoize identical (executable, args) calls cannot
        shortcut the measurement;
      - times EVERY loop individually (call + block_until_ready) and
        reports the MEDIAN with the interquartile range — host/tunnel
        hiccups land in the upper tail instead of skewing the mean;
      - warmup excludes compile + first-upload costs, like the
        reference's `timing_engine` (`inference_latency_evaluation.py:43-66`).

    Returns dict(ms_per_image=median, fps, ms_mean, ms_min, ms_p25,
    ms_p75, ms_p95, loops).
    """
    images = np.asarray(images)
    valid_hw = jnp.asarray(valid_hw, jnp.float32)
    batch = images.shape[0]
    rng = np.random.RandomState(0)
    variants = [jax.device_put(jnp.asarray(images))]
    for _ in range(max(distinct_inputs - 1, 0)):
        noise = rng.randint(0, 255, images.shape).astype(images.dtype)
        variants.append(jax.device_put(jnp.asarray(noise)))
    out = None
    for i in range(max(warmup_loops, len(variants))):
        out = engine(variants[i % len(variants)], valid_hw)
    jax.block_until_ready(out)
    samples = np.empty(timing_loops)
    for i in range(timing_loops):
        t0 = time.perf_counter()
        out = engine(variants[i % len(variants)], valid_hw)
        jax.block_until_ready(out)
        samples[i] = time.perf_counter() - t0
    ms = samples * 1000.0 / batch
    med = float(np.median(ms))
    return dict(
        ms_per_image=med,
        fps=1000.0 / med,
        ms_mean=float(ms.mean()),
        ms_min=float(ms.min()),
        ms_p25=float(np.percentile(ms, 25)),
        ms_p75=float(np.percentile(ms, 75)),
        ms_p95=float(np.percentile(ms, 95)),
        loops=int(timing_loops),
    )


def inference_latency_evaluation(
    detector,
    variables,
    resolutions=((480, 640), (720, 1280), (1080, 1920), (2160, 3840)),
    precisions=("fp32", "bf16"),
    preprocess=None,
    batch_size=1,
    warmup_loops=10,
    timing_loops=50,
    size_divisor=None,
    verbose=True,
):
    """Resolution x precision latency sweep (the reference's
    `timing_inference_latency.py` benchmark across 640x480..4K)."""
    from .compile import compile_inference

    divisor = size_divisor or max(detector.point_strides)
    results = {}
    for precision in precisions:
        for (h, w) in resolutions:
            ph = (h + divisor - 1) // divisor * divisor
            pw = (w + divisor - 1) // divisor * divisor
            engine = compile_inference(
                detector, variables, (ph, pw), precision=precision,
                preprocess=preprocess, batch_size=batch_size,
            )
            images = np.random.randint(
                0, 255, (batch_size, ph, pw, 3), dtype=np.uint8
            )
            r = timing_inference(
                engine, images, (h, w), warmup_loops, timing_loops
            )
            results[(precision, (h, w))] = r
            if verbose:
                print(
                    f"[{precision}] {w}x{h}: median {r['ms_per_image']:.2f} ms/image "
                    f"(IQR {r['ms_p25']:.2f}-{r['ms_p75']:.2f}), "
                    f"{r['fps']:.1f} FPS (end-to-end incl. decode+NMS)"
                )
    return results
