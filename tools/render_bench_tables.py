#!/usr/bin/env python
"""Render bench_sweep_results.json into reference-README-style markdown
latency tables (ms + FPS), grouped by model family and precision.

Each cell is compared against the reference's published RTX-2080Ti
TensorRT row (`/root/reference/README.md:49-78,100-124`; precision map
fp32↔FP32, bf16↔FP16, int8↔INT8 — the TRT numbers are NETWORK-ONLY
while ours include device preprocess + decode + NMS). Losing cells print
the reference number inline plus, when measured, the device-only time
(`ms_device`, from tools/bench_device_cell.py — separates "our program
is slow" from "the remote tunnel's fixed dispatch floor dominates").
Sub-3 ms cells carry their IQR (dispatch-floor jitter can invert
neighbors).

Run: python tools/render_bench_tables.py [results.json]
"""
import json
import os
import sys

# reference README latency matrices, ms (see module docstring for source)
_W = {"XS": "WIDERFACE-XS", "S": "WIDERFACE-S", "M": "WIDERFACE-M",
      "L": "WIDERFACE-L"}
REF_MS = {}
for _prec, _rows in {
    "fp32": {"L": (2.67, 6.31, 13.51, 94.61), "M": (2.47, 5.70, 12.28, 87.90),
             "S": (1.82, 3.57, 7.35, 27.93), "XS": (1.58, 3.03, 6.14, 23.26)},
    "bf16": {"L": (1.68, 3.69, 7.66, 28.65), "M": (1.61, 3.51, 7.31, 27.32),
             "S": (1.26, 2.39, 4.88, 18.46), "XS": (1.23, 2.18, 4.57, 17.35)},
    "int8": {"L": (1.50, 3.24, 6.83, None), "M": (1.45, 3.15, 6.61, None),
             "S": (1.17, 2.14, 4.40, None), "XS": (1.09, 2.03, 4.11, None)},
}.items():
    for _m, _vals in _rows.items():
        for _hw, _v in zip(((480, 640), (720, 1280), (1080, 1920),
                            (2160, 3840)), _vals):
            if _v is not None:
                REF_MS[(_W[_m], _prec) + _hw] = _v
for _prec, _rows in {
    "fp32": {"TT100K-L": (9.87, 21.56, 166.66), "TT100K-S": (4.31, 8.96, 34.01)},
    "bf16": {"TT100K-L": (6.28, 13.09, 49.79), "TT100K-S": (3.03, 6.27, 23.41)},
    "int8": {"TT100K-L": (5.96, 12.68, None), "TT100K-S": (2.90, 5.89, None)},
}.items():
    for _m, _vals in _rows.items():
        for _hw, _v in zip(((720, 1280), (1080, 1920), (2160, 3840)), _vals):
            if _v is not None:
                REF_MS[(_m, _prec) + _hw] = _v


def render(results):
    models = []
    for r in results:
        if r["model"] not in models:
            models.append(r["model"])
    order = {"fp32": 0, "bf16": 1, "int8": 2}
    precisions = sorted({r["precision"] for r in results},
                        key=lambda p: order.get(p, 9))
    resolutions = sorted({(r["height"], r["width"]) for r in results})

    by_key = {(r["model"], r["precision"], r["height"], r["width"]): r
              for r in results if "error" not in r}

    lines = []
    families = []
    for m in models:
        fam = m.split("-")[0]
        if fam not in families:
            families.append(fam)
    for fam in families:
        fam_models = [m for m in models if m.split("-")[0] == fam]
        fam_res = [hw for hw in resolutions
                   if any((m, p) + hw in by_key for m in fam_models for p in precisions)]
        lines.append(f"### {fam} (batch 1, end-to-end incl. device decode+NMS)")
        lines.append("")
        for p in precisions:
            if not any((m, p) + hw in by_key for m in fam_models for hw in fam_res):
                continue
            lines.append(f"* precision = {p}")
            lines.append("")
            lines.append("Model | " + " | ".join(f"{w}×{h}" for (h, w) in fam_res))
            lines.append("---|" + "---|" * len(fam_res))
            for m in fam_models:
                cells = []
                for hw in fam_res:
                    r = by_key.get((m, p) + hw)
                    if r is None:
                        cells.append("–")
                    else:
                        ms = r["ms_per_image"]
                        cell = f"{ms:.2f}ms({1000.0 / ms:.1f}FPS)"
                        # sub-3 ms cells sit at the remote backend's
                        # dispatch floor where tunnel jitter can invert
                        # neighbors (BENCH.md caveats): carry IQR inline
                        if ms < 3.0 and "ms_p25" in r:
                            cell += f" ±[{r['ms_p25']:.2f},{r['ms_p75']:.2f}]"
                        # losing cells carry the reference number and, when
                        # measured, the device-only time inline
                        ref = REF_MS.get((m, p) + hw)
                        if ref is not None and ms > ref:
                            loss = f"ref {ref:.2f}"
                            if "ms_device" in r:
                                dev = r["ms_device"]
                                mark = "device-time WINS" if dev <= ref else "dev loses too"
                                loss += f", dev {dev:.2f} → {mark}"
                            cell += f" **[{loss}]**"
                        elif "ms_device" in r:
                            cell += f" [dev {r['ms_device']:.2f}]"
                        cells.append(cell)
                lines.append(f"**{m}** | " + " | ".join(cells))
            lines.append("")
    return "\n".join(lines)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "bench_sweep_results.json")
    with open(path) as f:
        results = json.load(f)
    print(render(results))


if __name__ == "__main__":
    main()
