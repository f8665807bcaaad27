#!/usr/bin/env python
"""Component attribution for the FUSED INT8 engine (VERDICT r3 #6).

Measures ONE prefix of the int8 engine in a fresh process and prints one
`ATTRIB_RESULT {json}` line. A prefix program is built by running the
whole fused chain (deploy/int8_net.int8_fused_apply) with a `capture`
hook and returning ONLY a tiny reduction of the captured activation —
XLA dead-code-eliminates everything after it, so consecutive stages
differ by exactly one component and their time deltas attribute the
engine end-to-end:

    input    = device preprocess + input quantize + int8 write
    stem     = + stem convs (stem0..stemN, int8)
    backbone = + body stages (fused int8 chain, requant epilogues)
    neck     = + neck
    net      = + head (dequant handoff + float head convs)
    full     = + decode + NMS (the complete engine)

Timing: deploy/latency.timing_inference slope estimator (the campaign's
method); the per-segment fetch of the tiny probe cancels in the slope.
Run each stage as its own campaign cell (fresh process per cell — see
tools/bench_cell.py's docstring for why).

Usage: python tools/bench_int8_attrib.py WIDERFACE-L 1080 1920 STAGE [loops]
STAGE in {input, stem, backbone, neck, net, full}.
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

STAGES = ("input", "stem", "backbone", "neck", "net", "full")


def main():
    import time

    t0 = time.time()
    model_name = sys.argv[1]
    h, w = int(sys.argv[2]), int(sys.argv[3])
    stage = sys.argv[4]
    loops = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    assert stage in STAGES, stage

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench_cell import build_cell
    from lfdtpu.deploy import timing_inference
    from lfdtpu.deploy.compile import compile_inference
    from lfdtpu.deploy.int8_net import int8_fused_apply

    # calibration amax in a separate process (foreign-output D2H would
    # degrade this process's timed calls), disk-cached per (model, h, w)
    # so the six prefix cells of one attribution don't re-pay it
    from bench_cell import get_amax

    amax = get_amax(model_name, h, w)

    det, variables, preprocess = build_cell(model_name)
    divisor = max(det.point_strides)
    ph = (h + divisor - 1) // divisor * divisor
    pw = (w + divisor - 1) // divisor * divisor

    if stage == "full":
        engine = compile_inference(
            det, variables, (ph, pw), precision="int8",
            preprocess=preprocess, act_scales=amax,
        )
    else:
        # name the capture points: last stem module + top-level modules
        n_stems = sum(
            1 for k in variables["params"]["backbone"] if k.startswith("stem")
        )
        last_stem = f"backbone/stem{n_stems - 1}"
        probe_key = {
            "stem": last_stem, "backbone": "backbone", "neck": "neck",
        }.get(stage)

        run_vars = jax.device_put(variables)

        def prefix(run_vars, images):
            x = preprocess(images).astype(jnp.float32)
            capture = {} if probe_key is None else {probe_key: None}
            cls_o, reg_o = int8_fused_apply(
                det.net, run_vars, x, amax, capture=capture,
            )
            if stage == "input":
                # the quantized input is not a module output; rebuild the
                # quantize (same ops — XLA CSEs it with the chain's copy)
                from lfdtpu.deploy.int8_net import _quantize_to, _scale_of

                probe = _quantize_to(x, _scale_of(amax["__input__#out"]))
            elif stage == "net":
                probe = (cls_o, reg_o)
            else:
                probe = capture[probe_key]
            leaves = jax.tree.leaves(probe)
            acc = jnp.float32(0.0)
            for l in leaves:
                acc = acc + jnp.sum(l.astype(jnp.float32)) * 1e-30
            return {"count": acc}

        jitted = jax.jit(prefix)

        class _Eng:
            def __call__(self, images, valid_hw):
                return jitted(run_vars, images)

        engine = _Eng()

    images = np.random.randint(0, 255, (1, ph, pw, 3), dtype=np.uint8)
    t_build = time.time()
    r = timing_inference(engine, images, (h, w), warmup_loops=12,
                         timing_loops=loops if loops else None)
    r.update(
        model=model_name, precision="int8", stage=stage, height=h, width=w,
        build_s=round(t_build - t0, 1),
        timing_s=round(time.time() - t_build, 1),
    )
    print("ATTRIB_RESULT " + json.dumps(r))


if __name__ == "__main__":
    main()
