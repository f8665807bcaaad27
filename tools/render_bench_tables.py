#!/usr/bin/env python
"""Render bench_sweep_results.json into reference-README-style markdown
latency tables (ms + FPS), grouped by model family and precision.

Run: python tools/render_bench_tables.py [results.json]
"""
import json
import os
import sys


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
