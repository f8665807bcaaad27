#!/usr/bin/env python
"""Full latency sweep: model x precision x resolution, ONE PROCESS PER
CELL run strictly sequentially (two TPU processes wedge each other on
this backend), medians over >=100 loops with IQR.

Writes bench_sweep_results.json and prints a markdown table comparable to
the reference's README latency tables (which are network-only TensorRT
numbers on an RTX 2080Ti; ours include decode+NMS on device).

Usage: python tools/bench_sweep.py [--models WIDERFACE-XS,...] [--loops N]
"""
import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

MODELS = ["WIDERFACE-XS", "WIDERFACE-S", "WIDERFACE-M", "WIDERFACE-L"]
PRECISIONS = ["fp32", "bf16", "int8"]
RESOLUTIONS = [(480, 640), (720, 1280), (1080, 1920), (2160, 3840)]


def run_cell(model, precision, h, w, loops, timeout=2400, engine_kwargs=None):
    cmd = [sys.executable, os.path.join(HERE, "bench_cell.py"),
           model, precision, str(h), str(w), str(loops)]
    env = dict(os.environ)
    if engine_kwargs:
        env["LFD_BENCH_ENGINE_KWARGS"] = json.dumps(engine_kwargs)
    try:
        out = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout,
            cwd=os.path.join(HERE, ".."), env=env,
        )
    except subprocess.TimeoutExpired:
        return dict(model=model, precision=precision, height=h, width=w,
                    error="timeout")
    for line in out.stdout.splitlines():
        if line.startswith("CELL_RESULT "):
            return json.loads(line[len("CELL_RESULT "):])
    return dict(model=model, precision=precision, height=h, width=w,
                error=(out.stderr or out.stdout)[-500:])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default=",".join(MODELS))
    ap.add_argument("--precisions", default=",".join(PRECISIONS))
    ap.add_argument("--loops", type=int, default=100)
    ap.add_argument("--out", default=os.path.join(HERE, "..", "bench_sweep_results.json"))
    ap.add_argument("--resolutions", default=None,
                    help="comma list of HxW, e.g. 720x1280,1080x1920")
    ap.add_argument("--engine-kwargs", default=None,
                    help='JSON compile_inference kwargs for every cell, '
                         'e.g. \'{"s2d_stem": true}\' — use a separate '
                         "--out per variant")
    args = ap.parse_args()
    engine_kwargs = json.loads(args.engine_kwargs) if args.engine_kwargs else None

    global RESOLUTIONS
    if args.resolutions:
        RESOLUTIONS = [tuple(int(v) for v in r.split("x"))
                       for r in args.resolutions.split(",")]
    models = args.models.split(",")
    precisions = args.precisions.split(",")
    results = []
    if os.path.exists(args.out):
        # resume: keep completed cells, re-run errored/missing ones
        with open(args.out) as f:
            results = [r for r in json.load(f) if "error" not in r]
    done = {(r["model"], r["precision"], r["height"], r["width"])
            for r in results}
    for model in models:
        for precision in precisions:
            for (h, w) in RESOLUTIONS:
                if (model, precision, h, w) in done:
                    continue
                r = run_cell(model, precision, h, w, args.loops,
                             engine_kwargs=engine_kwargs)
                results.append(r)
                if "error" in r:
                    print(f"{model} {precision} {w}x{h}: ERROR {r['error'][:120]}",
                          flush=True)
                else:
                    print(
                        f"{model} {precision} {w}x{h}: median "
                        f"{r['ms_per_image']:.3f} ms (IQR {r['ms_p25']:.3f}-"
                        f"{r['ms_p75']:.3f}, p95 {r['ms_p95']:.3f}, "
                        f"{r['loops']} loops)",
                        flush=True,
                    )
                with open(args.out, "w") as f:
                    json.dump(results, f, indent=1)

    # markdown table
    print("\n| Model | Prec | " + " | ".join(f"{w}x{h}" for (h, w) in RESOLUTIONS) + " |")
    print("|" + "---|" * (2 + len(RESOLUTIONS)))
    for model in models:
        for precision in precisions:
            cells = []
            for (h, w) in RESOLUTIONS:
                r = next((x for x in results if x["model"] == model
                          and x["precision"] == precision
                          and x["height"] == h), None)
                cells.append(
                    f"{r['ms_per_image']:.2f}" if r and "error" not in r else "-"
                )
            print(f"| {model} | {precision} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
