#!/usr/bin/env python
"""Round-3 TPU measurement campaign: runs every pending measurement
(VERDICT r2 items #1/#2/#3/#6 + batch throughput) unattended, one fresh
process per cell, strictly sequential (one TPU process at a time on this
backend), resumable, and tunnel-aware: if the axon tunnel is down it
probes every 10 min and starts the moment it returns.

Results append to campaign_r3.jsonl (one JSON line per cell, keyed by
"id"); rerunning skips completed cells and retries errors. Progress is
narrated to stdout.

Launch detached:  nohup python tools/campaign_r3.py > campaign_r3.log 2>&1 &
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.join(HERE, "..")
OUT = os.path.join(REPO, "campaign_r3.jsonl")
PROBE_SLEEP = 600  # seconds between tunnel probes while down


def say(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def probe_tpu(timeout=240):
    """True iff a fresh process can init the axon TPU client."""
    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "import jax; print('OK', jax.devices())"],
            capture_output=True, text=True, timeout=timeout, cwd=REPO,
        )
        return out.returncode == 0 and "OK" in out.stdout
    except subprocess.TimeoutExpired:
        return False


def wait_for_tunnel():
    while not probe_tpu():
        say(f"tunnel down; sleeping {PROBE_SLEEP}s")
        time.sleep(PROBE_SLEEP)


def cells():
    """Priority-ordered measurement list. Each: id, tool, args, env,
    timeout, marker."""
    out = []

    def wall(id_, model, prec, h, w, loops=300, kwargs=None, batch=None,
             timeout=2400):
        env = {}
        if kwargs:
            env["LFD_BENCH_ENGINE_KWARGS"] = json.dumps(kwargs)
        if batch:
            env["LFD_BENCH_BATCH"] = str(batch)
        out.append(dict(
            id=id_, tool="bench_cell.py", marker="CELL_RESULT ",
            args=[model, prec, str(h), str(w), str(loops)], env=env,
            timeout=timeout,
        ))

    def dev(id_, model, prec, h, w, timeout=1800):
        out.append(dict(
            id=id_, tool="bench_device_cell.py", marker="DEVICE_RESULT ",
            args=[model, prec, str(h), str(w)], env={}, timeout=timeout,
        ))

    # --- phase 0: the verify-skill drive (end-to-end train + predict +
    # every engine flavor round-tripped on the REAL chip) — first so the
    # round's code is verified the moment the tunnel returns ---
    out.append(dict(
        id="verify-drive", tool="verify_drive.py", marker="DRIVE_RESULT ",
        args=[], env={}, timeout=1800,
    ))

    # --- phase A: headline engine variants (VERDICT #1, #2, #6) ---
    wall("int8-fused-L-1080", "WIDERFACE-L", "int8", 1080, 1920)
    wall("split-pallas-L-bf16-1080", "WIDERFACE-L", "bf16", 1080, 1920,
         kwargs={"split": True, "pallas_convs": True})
    wall("s2d-L-bf16-1080", "WIDERFACE-L", "bf16", 1080, 1920,
         kwargs={"s2d_stem": True})
    wall("split-only-L-bf16-1080", "WIDERFACE-L", "bf16", 1080, 1920,
         kwargs={"split": True})
    wall("split-pallas-s2d-L-bf16-1080", "WIDERFACE-L", "bf16", 1080, 1920,
         kwargs={"split": True, "pallas_convs": True, "s2d_stem": True})
    wall("int8-fused-S-1080", "WIDERFACE-S", "int8", 1080, 1920)
    # expected Mosaic compile failure — recorded as the written finding
    wall("pallas-stem-attempt-L-bf16-1080", "WIDERFACE-L", "bf16", 1080,
         1920, kwargs={"pallas_stem": True}, timeout=1200)

    # --- phase B: device-only time for every losing cell (VERDICT #3) ---
    dev("dev-L-bf16-480", "WIDERFACE-L", "bf16", 480, 640)
    dev("dev-S-bf16-480", "WIDERFACE-S", "bf16", 480, 640)
    dev("dev-M-bf16-480", "WIDERFACE-M", "bf16", 480, 640)
    dev("dev-XS-bf16-480", "WIDERFACE-XS", "bf16", 480, 640)
    dev("dev-XS-bf16-720", "WIDERFACE-XS", "bf16", 720, 1280)
    dev("dev-XS-fp32-480", "WIDERFACE-XS", "fp32", 480, 640)
    dev("dev-TTS-bf16-1080", "TT100K-S", "bf16", 1080, 1920)
    # reference point for interpreting the above
    dev("dev-L-bf16-1080", "WIDERFACE-L", "bf16", 1080, 1920)

    # --- phase C: fused-int8 sweep refresh (retire the 41 ms table).
    # Resolution-major, 1080p first and 4K LAST: if the round is cut
    # short the headline row lands and only the slowest cells are lost ---
    for (h, w) in [(1080, 1920), (720, 1280), (480, 640)]:
        for model, tag in [("WIDERFACE-XS", "XS"), ("WIDERFACE-S", "S"),
                           ("WIDERFACE-M", "M"), ("WIDERFACE-L", "L")]:
            id_ = f"int8-fused-{tag}-{h}"
            if any(c["id"] == id_ for c in out):
                continue
            wall(id_, model, "int8", h, w, loops=300, timeout=2400)

    # --- phase D: batch throughput (floor amortization; beyond parity) ---
    wall("batch4-L-bf16-1080", "WIDERFACE-L", "bf16", 1080, 1920, batch=4)
    wall("batch8-XS-bf16-480", "WIDERFACE-XS", "bf16", 480, 640, batch=8)
    wall("batch8-S-bf16-480", "WIDERFACE-S", "bf16", 480, 640, batch=8)
    wall("batch8-XS-bf16-720", "WIDERFACE-XS", "bf16", 720, 1280, batch=8)
    wall("batch8-L-bf16-480", "WIDERFACE-L", "bf16", 480, 640, batch=8)
    wall("batch4-TTS-bf16-1080", "TT100K-S", "bf16", 1080, 1920, batch=4)

    # --- phase E2: TT100K fused int8 (reference README.md:118-119 rows) ---
    wall("int8-fused-TTS-1080", "TT100K-S", "int8", 1080, 1920)
    wall("int8-fused-TTS-720", "TT100K-S", "int8", 720, 1280)
    wall("int8-fused-TTL-1080", "TT100K-L", "int8", 1080, 1920)
    wall("int8-fused-TTL-720", "TT100K-L", "int8", 720, 1280)

    # --- phase F: measured train step at the reference training config
    # (crop 480, batch 64 — `WIDERFACE_LFD_S.py:168-189`); turns BENCH.md's
    # "~3 ms device step" attribution into a measured row ---
    for model, tag in [("WIDERFACE-S", "S"), ("WIDERFACE-L", "L")]:
        out.append(dict(
            id=f"trainstep-{tag}-b64-480", tool="bench_train_step.py",
            marker="TRAIN_RESULT ", args=[model, "64", "480", "20"],
            env={}, timeout=2400,
        ))

    # --- phase E: best-variant cross-checks at other sizes ---
    wall("s2d-M-bf16-1080", "WIDERFACE-M", "bf16", 1080, 1920,
         kwargs={"s2d_stem": True})
    wall("split-pallas-M-bf16-1080", "WIDERFACE-M", "bf16", 1080, 1920,
         kwargs={"split": True, "pallas_convs": True})

    # --- phase G (slowest, last): 4K cells — int8 refresh + s2d check ---
    for model, tag in [("WIDERFACE-XS", "XS"), ("WIDERFACE-S", "S"),
                       ("WIDERFACE-M", "M"), ("WIDERFACE-L", "L")]:
        wall(f"int8-fused-{tag}-2160", model, "int8", 2160, 3840,
             loops=120, timeout=3600)
    wall("s2d-L-bf16-2160", "WIDERFACE-L", "bf16", 2160, 3840, loops=200,
         kwargs={"s2d_stem": True}, timeout=3600)
    return out


def load_done():
    done = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            for line in f:
                try:
                    r = json.loads(line)
                except ValueError:
                    continue
                done[r["id"]] = r
    return done


def run_cell(cell):
    cmd = [sys.executable, os.path.join(HERE, cell["tool"])] + cell["args"]
    env = dict(os.environ)
    env.update(cell["env"])
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=cell["timeout"], cwd=REPO, env=env)
    except subprocess.TimeoutExpired:
        return dict(id=cell["id"], error="timeout")
    for line in out.stdout.splitlines():
        if line.startswith(cell["marker"]):
            r = json.loads(line[len(cell["marker"]):])
            r["id"] = cell["id"]
            return r
    return dict(id=cell["id"], error=(out.stderr or out.stdout)[-1200:])


def main():
    todo = cells()
    done = load_done()
    pending = [c for c in todo
               if c["id"] not in done or "error" in done[c["id"]]]
    say(f"{len(todo)} cells total, {len(pending)} pending")
    for cell in pending:
        wait_for_tunnel()
        say(f"running {cell['id']} ...")
        r = run_cell(cell)
        if r.get("error") == "timeout" and not probe_tpu():
            # tunnel dropped mid-cell: wait and retry once more
            say(f"{cell['id']} timed out AND tunnel is down — will retry")
            wait_for_tunnel()
            r = run_cell(cell)
        with open(OUT, "a") as f:
            f.write(json.dumps(r) + "\n")
        if "error" in r:
            say(f"{cell['id']}: ERROR {r['error'][:200]}")
        else:
            ms = r.get("ms_per_image") or r.get("ms_device")
            say(f"{cell['id']}: {ms} ms")
    say("campaign complete")


if __name__ == "__main__":
    main()
