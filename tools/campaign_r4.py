#!/usr/bin/env python
"""Round-4 TPU measurement campaign: finishes the 33 cells round 3 left
pending (VERDICT r3 #1/#4/#5) and adds the round-4 evidence cells (int8
attribution, int8+s2d composition, bf16 train steps, re-verified drive).

Mechanics (same as campaign_r3.py): one fresh process per cell, strictly
sequential, resumable, tunnel-aware. Results append to campaign_r4.jsonl;
cells already completed in campaign_r3.jsonl are inherited (NOT re-run),
except the verify drive, which re-runs as `verify-drive-r4` because the
drive itself changed (real-scene int8 calibration + recorded box drift).
The r3 `pallas-stem-attempt` error row is a RECORDED FINDING (Mosaic
compile failure, BENCH.md) and is not retried.

Extra cells can be appended WHILE the campaign runs by writing a JSON
list of cell dicts to tools/campaign_r4_extra.json — the file is
re-read between cells and unseen ids jump to the front of the queue.

Launch detached:  nohup python tools/campaign_r4.py > campaign_r4.log 2>&1 &
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.join(HERE, "..")
OUT = os.path.join(REPO, "campaign_r4.jsonl")
R3 = os.path.join(REPO, "campaign_r3.jsonl")
EXTRA = os.path.join(HERE, "campaign_r4_extra.json")
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
    """Priority-ordered measurement list: headline-completing cells first,
    slowest (4K) last, so a cut-short round loses only the tail."""
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

    # --- 0: re-verify the round's code on the real chip (drive changed:
    # real-scene int8 calibration, recorded box drift, tightened asserts)
    out.append(dict(
        id="verify-drive-r4", tool="verify_drive.py", marker="DRIVE_RESULT ",
        args=[], env={}, timeout=1800,
    ))

    # --- 1: complete the 1080p fused-int8 row (headline table) ---
    wall("int8-fused-XS-1080", "WIDERFACE-XS", "int8", 1080, 1920)
    wall("int8-fused-M-1080", "WIDERFACE-M", "int8", 1080, 1920)
    wall("int8-fused-L-1080", "WIDERFACE-L", "int8", 1080, 1920)  # done r3
    wall("int8-fused-S-1080", "WIDERFACE-S", "int8", 1080, 1920)  # done r3

    # --- 2: training throughput at the reference config (VERDICT #4:
    # "the training story currently has zero measured TPU numbers") ---
    for model, tag in [("WIDERFACE-S", "S"), ("WIDERFACE-L", "L")]:
        for prec in ("fp32", "bf16"):
            out.append(dict(
                id=f"trainstep-{tag}-{prec}-b64-480",
                tool="bench_train_step.py", marker="TRAIN_RESULT ",
                args=[model, "64", "480", "20", prec], env={}, timeout=2400,
            ))

    # --- 3: int8 device-only anchor (attribution + MFU denominator) ---
    dev("dev-int8-L-1080", "WIDERFACE-L", "int8", 1080, 1920)

    # --- 3b: int8 engine attribution EARLY (VERDICT r3 #6): DCE-truncated
    # prefix programs; consecutive deltas attribute the 6.38 ms, and this
    # round's optimization work keys off the result ---
    for stage in ("input", "stem", "backbone", "neck", "net", "full"):
        out.append(dict(
            id=f"attrib-int8-L-1080-{stage}", tool="bench_int8_attrib.py",
            marker="ATTRIB_RESULT ",
            args=["WIDERFACE-L", "1080", "1920", stage], env={}, timeout=2400,
        ))

    # --- 4: fused-int8 720p + 480p rows (retire the 41 ms table) ---
    for (h, w) in [(720, 1280), (480, 640)]:
        for model, tag in [("WIDERFACE-XS", "XS"), ("WIDERFACE-S", "S"),
                           ("WIDERFACE-M", "M"), ("WIDERFACE-L", "L")]:
            wall(f"int8-fused-{tag}-{h}", model, "int8", h, w)

    # --- 5: batch throughput (floor amortization; VERDICT #5) ---
    wall("batch4-L-bf16-1080", "WIDERFACE-L", "bf16", 1080, 1920, batch=4)
    wall("batch8-XS-bf16-480", "WIDERFACE-XS", "bf16", 480, 640, batch=8)
    wall("batch8-S-bf16-480", "WIDERFACE-S", "bf16", 480, 640, batch=8)
    wall("batch8-XS-bf16-720", "WIDERFACE-XS", "bf16", 720, 1280, batch=8)
    wall("batch8-L-bf16-480", "WIDERFACE-L", "bf16", 480, 640, batch=8)
    wall("batch4-TTS-bf16-1080", "TT100K-S", "bf16", 1080, 1920, batch=4)

    # --- 6: TT100K fused int8 (reference README.md:118-119 rows) ---
    wall("int8-fused-TTS-1080", "TT100K-S", "int8", 1080, 1920)
    wall("int8-fused-TTS-720", "TT100K-S", "int8", 720, 1280)
    wall("int8-fused-TTL-1080", "TT100K-L", "int8", 1080, 1920)
    wall("int8-fused-TTL-720", "TT100K-L", "int8", 720, 1280)

    # --- 6b: (moved to 3b) ---
    # --- 6c: s2d composed with int8 — ANSWERED: int8-s2d-bf16head-L-1080
    # measured 10.43 ms (campaign_r4.jsonl) = rejected; the plain
    # (f32-remainder) variant is strictly worse and is not re-run.

    # --- 6d: per-size int8 engine accuracy (VERDICT r3 #7): mAP_50
    # delta fp32-engine vs fused-int8-engine on the trained synthetic
    # model, real-crop calibration ---
    for model, tag in [("WIDERFACE-XS", "XS"), ("WIDERFACE-S", "S"),
                       ("WIDERFACE-M", "M"), ("WIDERFACE-L", "L")]:
        out.append(dict(
            id=f"int8-quality-{tag}", tool="int8_quality_cell.py",
            marker="QUALITY_RESULT ",
            args=[model], env={}, timeout=3600,
        ))

    # --- 6e: int8 MFU next to bf16's 8.3% (VERDICT r3 #6) ---
    out.append(dict(
        id="mfu-int8-L-1080", tool="bench_mfu.py", marker="MFU_RESULT ",
        args=["WIDERFACE-L", "int8", "1080", "1920"], env={}, timeout=2400,
    ))

    # --- 7: device-only time for the remaining r3 losing cells ---
    dev("dev-XS-bf16-720", "WIDERFACE-XS", "bf16", 720, 1280)
    dev("dev-XS-fp32-480", "WIDERFACE-XS", "fp32", 480, 640)
    dev("dev-TTS-bf16-1080", "TT100K-S", "bf16", 1080, 1920)
    dev("dev-L-bf16-1080", "WIDERFACE-L", "bf16", 1080, 1920)

    # --- 8: best-variant cross-checks at other sizes ---
    wall("s2d-M-bf16-1080", "WIDERFACE-M", "bf16", 1080, 1920,
         kwargs={"s2d_stem": True})
    wall("split-pallas-M-bf16-1080", "WIDERFACE-M", "bf16", 1080, 1920,
         kwargs={"split": True, "pallas_convs": True})

    # --- 9 (slowest, last): 4K cells — int8 refresh + s2d check ---
    for model, tag in [("WIDERFACE-XS", "XS"), ("WIDERFACE-S", "S"),
                       ("WIDERFACE-M", "M"), ("WIDERFACE-L", "L")]:
        wall(f"int8-fused-{tag}-2160", model, "int8", 2160, 3840,
             loops=120, timeout=3600)
    wall("s2d-L-bf16-2160", "WIDERFACE-L", "bf16", 2160, 3840, loops=200,
         kwargs={"s2d_stem": True}, timeout=3600)
    return out


def load_done():
    """Completed cells: r3 results are inherited; r4 errors retry.

    The r3 pallas-stem error row is kept as done (it IS the finding)."""
    done = {}
    for path, keep_errors in ((R3, True), (OUT, False)):
        if not os.path.exists(path):
            continue
        with open(path) as f:
            for line in f:
                try:
                    r = json.loads(line)
                except ValueError:
                    continue
                if "error" in r and not keep_errors:
                    continue
                done[r["id"]] = r
    return done


def load_extra(seen_ids):
    """Cells appended while the campaign runs (tools/campaign_r4_extra.json)."""
    if not os.path.exists(EXTRA):
        return []
    try:
        with open(EXTRA) as f:
            rows = json.load(f)
    except ValueError:
        return []
    return [r for r in rows if r["id"] not in seen_ids]


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
    say(f"{len(todo)} cells total, {len(pending)} pending "
        f"({len(done)} inherited/done)")
    seen = {c["id"] for c in todo} | set(done)
    wait_for_tunnel()
    while True:
        # extras file first: lets new tools land mid-campaign (also checked
        # before the empty-queue exit so a relaunch with all builtin cells
        # done still drains a freshly appended extras file)
        extra = load_extra(seen)
        if extra:
            say(f"picked up {len(extra)} extra cells: "
                + ", ".join(c["id"] for c in extra))
            pending = extra + pending
            seen |= {c["id"] for c in extra}
        if not pending:
            break
        cell = pending.pop(0)
        say(f"running {cell['id']} ...")
        r = run_cell(cell)
        if "error" in r and not probe_tpu():
            # tunnel dropped mid-cell: wait and retry once more
            say(f"{cell['id']} errored AND tunnel is down — will retry")
            wait_for_tunnel()
            r = run_cell(cell)
        with open(OUT, "a") as f:
            f.write(json.dumps(r) + "\n")
        if "error" in r:
            say(f"{cell['id']}: ERROR {r['error'][:300]}")
        else:
            ms = (r.get("ms_per_image") or r.get("ms_device")
                  or r.get("ms_per_step"))
            say(f"{cell['id']}: {ms} ms")
    say("campaign complete")


if __name__ == "__main__":
    main()
