#!/usr/bin/env python
"""Fold campaign jsonl cells into bench_sweep_results.json and print a
digest for BENCH.md. Accepts multiple jsonl paths (later files win per
cell id); default = campaign_r3.jsonl + campaign_r4.jsonl + campaign_r5.jsonl.

- Base cells (no engine_kwargs, batch 1) replace the matching
  (model, precision, height, width) row of bench_sweep_results.json —
  the fused-int8 refresh that retires the round-2 unfused int8 table.
- Variant cells (engine_kwargs: split/pallas/s2d) and batch-throughput
  cells are NOT folded into the base table; they are printed grouped for
  the BENCH.md variant/throughput sections.
- Device-time cells (ms_device) print alongside their wall-slope base
  cell so each losing cell carries device-only evidence (VERDICT r2 #3).

Run: python tools/merge_campaign_results.py [--write]
"""
import json
import os
import sys

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def load_jsonl(paths):
    rows = []
    for path in paths:
        if not os.path.exists(path):
            continue
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    rows.append(json.loads(line))
    # last result per id wins (retries append; later files override
    # earlier ones, and a non-error result overrides an inherited error)
    by_id = {}
    for r in rows:
        if r["id"] in by_id and "error" in r and "error" not in by_id[r["id"]]:
            continue
        by_id[r["id"]] = r
    return list(by_id.values())


def main():
    write = "--write" in sys.argv
    paths = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not paths:
        paths = [os.path.join(REPO, "campaign_r3.jsonl"),
                 os.path.join(REPO, "campaign_r4.jsonl"),
                 os.path.join(REPO, "campaign_r5.jsonl")]
    campaign = load_jsonl(paths)
    sweep_path = os.path.join(REPO, "bench_sweep_results.json")
    with open(sweep_path) as f:
        sweep = json.load(f)

    errors = [r for r in campaign if "error" in r]
    base, variants, batches, device, other = [], [], [], [], []
    trains, attribs, quality, streams = [], [], [], []
    for r in campaign:
        if "error" in r:
            continue
        if "stream_mode" in r:
            # serving rows measure per-image wall WITH every result
            # fetched; they must never fold into the sweep/base tables
            streams.append(r)
        elif "ms_device" in r:
            device.append(r)
        elif "ms_per_step" in r:
            trains.append(r)
        elif "flops" in r:
            # MFU cells re-time the engine at high loop counts; they are
            # evidence for the MFU line, not sweep-table replacements
            other.append(r)
        elif "stage" in r:
            attribs.append(r)
        elif "int8_delta" in r:
            quality.append(r)
        elif r.get("engine_kwargs"):
            variants.append(r)
        elif "ms_per_image" in r and r.get("batch", 1) > 1:
            batches.append(r)
        elif "ms_per_image" in r:
            base.append(r)
        else:
            other.append(r)

    key = lambda r: (r["model"], r["precision"], r["height"], r["width"])
    by_key = {key(r): i for i, r in enumerate(sweep)}
    replaced, added = 0, 0
    for r in base:
        row = {k: v for k, v in r.items() if k != "id"}
        if key(r) in by_key:
            sweep[by_key[key(r)]] = row
            replaced += 1
        else:
            sweep.append(row)
            added += 1
            by_key[key(r)] = len(sweep) - 1
    # The pre-campaign int8 sweep rows measured the RETIRED round-2
    # unfused engine (per-conv dequant/requant; BENCH.md "INT8 history").
    # Any int8 row not re-measured by a fused-chain campaign cell is
    # dropped rather than published: the renderer prints "–" for it.
    fused_int8 = {key(r) for r in base if r["precision"] == "int8"}
    stale = [s for s in sweep if s["precision"] == "int8"
             and (s["model"], s["precision"], s["height"], s["width"])
             not in fused_int8]
    if stale:
        sweep = [s for s in sweep if s["precision"] != "int8"
                 or (s["model"], s["precision"], s["height"], s["width"])
                 in fused_int8]
        by_key = {(r["model"], r["precision"], r["height"], r["width"]): i
                  for i, r in enumerate(sweep)}
        print(f"dropped {len(stale)} stale (unfused-engine) int8 rows")
    # attach device-only times to their wall-slope rows so the rendered
    # tables carry the dispatch-floor evidence inline (VERDICT r3 #1).
    # Variant device cells (engine_kwargs) measure a DIFFERENT program —
    # they stay in the digest but never attach to the base sweep row.
    for r in device:
        if r.get("engine_kwargs"):
            continue
        i = by_key.get(key(r))
        if i is not None:
            sweep[i]["ms_device"] = r["ms_device"]

    print(f"campaign cells: {len(campaign)}  errors: {len(errors)}")
    for r in errors:
        print(f"  ERROR {r['id']}: {str(r['error'])[:160]}")
    print(f"base cells folded into sweep: {replaced} replaced, {added} added")

    if variants:
        print("\n== engine variants (BENCH.md variant section) ==")
        for r in sorted(variants, key=lambda r: r["id"]):
            kw = ",".join(k for k, v in r["engine_kwargs"].items() if v)
            print(f"  {r['model']} {r['precision']} {r['width']}x{r['height']}"
                  f" [{kw}]: {r['ms_per_image']:.2f} ms"
                  f" (IQR {r.get('ms_p25', 0):.2f}-{r.get('ms_p75', 0):.2f})")
    if batches:
        print("\n== batch throughput ==")
        for r in sorted(batches, key=lambda r: r["id"]):
            print(f"  {r['model']} {r['precision']} {r['width']}x{r['height']}"
                  f" batch={r['batch']}: {r['ms_per_image']:.2f} ms/image"
                  f" ({r['fps']:.0f} img/s)")
    if device:
        print("\n== device-only time vs wall slope (losing-cell evidence) ==")
        for r in sorted(device, key=lambda r: r["id"]):
            k = key(r)
            wall = next((s for s in sweep
                         if (s["model"], s["precision"], s["height"],
                             s["width"]) == k), None)
            ws = f"{wall['ms_per_image']:.2f}" if wall else "?"
            print(f"  {r['model']} {r['precision']} {r['width']}x{r['height']}:"
                  f" device {r['ms_device']:.2f} ms | wall slope {ws} ms")
    if trains:
        print("\n== training throughput (device step, reference config) ==")
        for r in sorted(trains, key=lambda r: r["id"]):
            aug = " +devaug" if r.get("devaug") else ""
            print(f"  {r['model']} {r.get('precision', 'fp32')}{aug}"
                  f" batch={r['batch']} crop={r['crop']}:"
                  f" {r['ms_per_step']:.2f} ms/step"
                  f" ({r['images_per_s']:.0f} img/s)")
    if attribs:
        print("\n== int8 attribution (prefix-program stages; deltas"
              " attribute the engine) ==")
        prev = None
        prev_group = None
        order = {"input": 0, "stem": 1, "backbone": 2, "neck": 3,
                 "net": 4, "full": 5}
        for r in sorted(attribs, key=lambda r: (r["model"], r["height"],
                                                order.get(r["stage"], 9))):
            group = (r["model"], r["height"])
            if group != prev_group:
                prev, prev_group = None, group
            d = "" if prev is None else f"  (+{r['ms_per_image'] - prev:.2f})"
            print(f"  {r['model']} {r['width']}x{r['height']}"
                  f" {r['stage']}: {r['ms_per_image']:.2f} ms{d}")
            prev = r["ms_per_image"]
    if quality:
        print("\n== int8 engine accuracy (synthetic mAP_50, real-crop"
              " calibration) ==")
        for r in sorted(quality, key=lambda r: r["id"]):
            print(f"  {r['model']}: fp32 {r['mAP_50_fp32_engine']:.3f}"
                  f" int8 {r['mAP_50_int8_engine']:.3f}"
                  f" delta {r['int8_delta']:+.3f}")
    if streams:
        print("\n== streaming serving (BENCH.md streaming section) ==")
        for r in sorted(streams, key=lambda r: r["id"]):
            print(f"  {r['model']} {r['precision']} {r['width']}x{r['height']}"
                  f" {r['stream_mode']} depth={r.get('stream_depth')}"
                  f" batch={r.get('batch', 1)}: {r['ms_per_image']:.2f}"
                  f" ms/image (all fetched)")
    if other:
        print("\n== other cells ==")
        for r in other:
            print(f"  {r['id']}: {json.dumps({k: v for k, v in r.items() if k != 'id'})[:200]}")

    if write:
        with open(sweep_path, "w") as f:
            json.dump(sweep, f, indent=1)
        print(f"\nwrote {sweep_path} ({len(sweep)} rows)")
    else:
        print("\n(dry run; pass --write to update bench_sweep_results.json)")


if __name__ == "__main__":
    main()
