#!/usr/bin/env python
"""Device time of ONE jitted training step (forward + on-device target
assignment + loss + grad + clip + SGD update) at a workload's training
config. Prints one `TRAIN_RESULT {json}` line.

Method: the step chains naturally (each consumes the previous state), so
a segment of K enqueued steps closed by fetching the LAST metrics' own
loss scalar is a true completion barrier on the enqueue-async backend;
the per-step time is the two-depth slope (t_2K - t_K)/K, which cancels
the fixed fetch cost (deploy/latency.py methodology).

Usage: python tools/bench_train_step.py WIDERFACE-S 64 480 [K] [fp32|bf16] [devaug]

The optional 5th arg selects the step's compute precision: bf16 builds
the mixed-precision step (bf16 forward/backward, f32 master weights /
loss / optimizer — `parallel/data_parallel.make_train_step`).

The optional 6th arg `devaug` measures the step WITH device-side
augmentation fused in (data/device_aug.make_device_augment): the input
becomes the devaug contract's {uint8 source buffer, scale, translation,
flip} pytree and the step resamples + flips + normalizes on-chip before
the forward — the marginal cost over the plain step is the device price
of moving augmentation off the (measured 4-11x slower) host loader.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    t0 = time.time()
    model_name = sys.argv[1] if len(sys.argv) > 1 else "WIDERFACE-S"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    crop = int(sys.argv[3]) if len(sys.argv) > 3 else 480
    K = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    precision = sys.argv[5] if len(sys.argv) > 5 else "fp32"
    assert precision in ("fp32", "bf16"), precision
    devaug = len(sys.argv) > 6 and sys.argv[6].startswith("devaug")
    # "devaug-bf16": run the resample arithmetic in bf16 (halves the aug's
    # HBM traffic inside a mixed-precision step; ~1 uint8 LSB rounding)
    devaug_dtype = "bfloat16" if (len(sys.argv) > 6
                                  and sys.argv[6] == "devaug-bf16") else None

    import jax
    import numpy as np

    from lfdtpu.execution.optim import SGD
    from lfdtpu.parallel import make_train_step
    from lfdtpu.parallel.data_parallel import create_train_state
    from lfdtpu.zoo import ZOO

    det = ZOO[model_name]()
    hw = (crop, crop)
    optimizer = SGD(momentum=0.9, weight_decay=1e-4)
    state = create_train_state(det, optimizer, jax.random.PRNGKey(0), hw,
                               batch_size=batch)
    preprocess = None
    if devaug:
        from lfdtpu.data import make_device_augment
        from lfdtpu.deploy import make_device_preprocess

        preprocess = make_device_augment(
            crop,
            normalize=make_device_preprocess((0.5,) * 3, (0.5,) * 3),
            compute_dtype=devaug_dtype,
        )
    step = make_train_step(det, optimizer, hw, clip_max_norm=10.0,
                           mixed_precision=(precision == "bf16"),
                           preprocess=preprocess)

    # reference-shaped batch: crop-sized frames, padded GT (Nmax=64)
    rng = np.random.RandomState(0)
    if devaug:
        # the loader contract: raw uint8 source windows (buffer =
        # crop/0.8 + margin, matching tools/bench_loader.py's devaug
        # configuration) + per-image resample params
        buf = int(crop / 0.8) + 16
        images = jax.device_put(dict(
            buffer=rng.randint(0, 255, (batch, buf, buf, 3)).astype(np.uint8),
            scale=np.full((batch, 2), 1.1, np.float32),
            translation=np.full((batch, 2), -3.0, np.float32),
            flip=(rng.rand(batch) > 0.5).astype(np.float32),
        ))
    else:
        images = jax.device_put(rng.rand(batch, crop, crop, 3).astype(np.float32))
    nmax = 64
    gt = np.zeros((batch, nmax, 4), np.float32)
    gt[:, :8] = rng.rand(batch, 8, 4).astype(np.float32) * 60
    gt[:, :8, 2:] += 8
    labels = np.zeros((batch, nmax), np.int32)
    mask = np.zeros((batch, nmax), bool)
    mask[:, :8] = True
    gt, labels, mask = map(jax.device_put, (gt, labels, mask))
    lr = np.float32(0.1)
    trainb = np.bool_(True)

    def run(n, state):
        for _ in range(n):
            state, metrics = step(state, images, gt, labels, mask, lr, trainb)
        return state, metrics

    # warmup: compile + one fetch
    state, metrics = run(2, state)
    _ = float(metrics["loss"])
    t_build = time.time()

    def timed(n, state):
        t1 = time.perf_counter()
        state, metrics = run(n, state)
        loss = float(metrics["loss"])  # own-output fetch = completion
        return time.perf_counter() - t1, loss, state

    t_k, loss, state = timed(K, state)
    t_2k, loss, state = timed(2 * K, state)
    ms = (t_2k - t_k) / K * 1000.0
    r = dict(
        ms_per_step=round(ms, 3),
        images_per_s=round(batch / (ms / 1000.0), 1),
        model=model_name, batch=batch, crop=crop, loops=3 * K,
        precision=precision, devaug=devaug,
        devaug_dtype=devaug_dtype or ("f32" if devaug else None),
        loss=round(loss, 4),
        build_s=round(t_build - t0, 1),
        timing_s=round(time.time() - t_build, 1),
    )
    print("TRAIN_RESULT " + json.dumps(r))


if __name__ == "__main__":
    main()
