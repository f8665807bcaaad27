#!/usr/bin/env python
"""Regenerate BENCH.md's latency-sweep tables in place.

Pipeline: merge_campaign_results --write (folds campaign jsonl cells
into bench_sweep_results.json and attaches ms_device) must run first;
this tool then replaces everything between the
`<!-- SWEEP_TABLES -->` ... `<!-- /SWEEP_TABLES -->` markers in BENCH.md
with render_bench_tables output, so the published tables always equal
the raw measured data.

Run: python tools/merge_campaign_results.py --write
     python tools/update_bench_md.py
"""
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.join(HERE, "..")
sys.path.insert(0, HERE)

BEGIN = "<!-- SWEEP_TABLES -->"
END = "<!-- /SWEEP_TABLES -->"


def main():
    from render_bench_tables import render

    with open(os.path.join(REPO, "bench_sweep_results.json")) as f:
        results = json.load(f)
    tables = render(results)

    path = os.path.join(REPO, "BENCH.md")
    with open(path) as f:
        src = f.read()
    i = src.index(BEGIN) + len(BEGIN)
    j = src.index(END)
    out = src[:i] + "\n\n" + tables + "\n" + src[j:]
    with open(path, "w") as f:
        f.write(out)
    print(f"BENCH.md sweep tables regenerated ({len(results)} rows)")


if __name__ == "__main__":
    main()
