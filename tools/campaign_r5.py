#!/usr/bin/env python
"""Round-5 TPU measurement campaign (VERDICT r4 items #2,3,4,5,7).

Cells, priority-ordered:
  1. quantized-output engines (VERDICT #7): f16 boxes/scores halve the
     result payload the int8 attribution pinned ~0.7 ms on.
  2. device-aug train-step cost (VERDICT #2's device half): the marginal
     ms of fusing resample+flip+normalize into the train step, next to
     the measured 7.7-9.4x host feed-rate gain (loader-bench-devaug row).
  3. TT100K-S 1080p (VERDICT #4): device-side int8 baseline + the
     approx_topk and decode-budget knobs.
  4. int8 attribution at the losing resolutions (VERDICT #3): DCE-prefix
     stages at L-480/L-4K/M-720 + the int8_head_dtype/s2d knobs there.
  5. stream-block depth sweep at S-480 (VERDICT #5): find where blocking
     fetches degrade below the sync loop, with/without pack_output.

Mechanics identical to campaign_r4.py: one fresh process per cell,
strictly sequential, resumable (completed ids in campaign_r5.jsonl are
skipped), tunnel-aware. Extra cells can be appended while running via
tools/campaign_r5_extra.json.

Launch detached:  nohup python tools/campaign_r5.py > campaign_r5.log 2>&1 &
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.join(HERE, "..")
OUT = os.path.join(REPO, "campaign_r5.jsonl")
EXTRA = os.path.join(HERE, "campaign_r5_extra.json")
PROBE_SLEEP = 600


def say(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def probe_tpu(timeout=240):
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

    def dev(id_, model, prec, h, w, kwargs=None, timeout=1800):
        env = {}
        if kwargs:
            env["LFD_BENCH_ENGINE_KWARGS"] = json.dumps(kwargs)
        out.append(dict(
            id=id_, tool="bench_device_cell.py", marker="DEVICE_RESULT ",
            args=[model, prec, str(h), str(w)], env=env, timeout=timeout,
        ))

    def stream(id_, model, prec, h, w, images=300, depth=4,
               mode="stream-async", kwargs=None, batch=None, timeout=2400):
        env = {}
        if kwargs:
            env["LFD_BENCH_ENGINE_KWARGS"] = json.dumps(kwargs)
        if batch:
            env["LFD_BENCH_BATCH"] = str(batch)
        out.append(dict(
            id=id_, tool="bench_stream.py", marker="CELL_RESULT ",
            args=[model, prec, str(h), str(w), str(images), str(depth), mode],
            env=env, timeout=timeout,
        ))

    # Wall-clock-aware ordering, re-cut after the round-5 stall: the
    # cells whose numbers are ALREADY CITED in BENCH.md's devaug tables
    # (evidence-integrity) run first, then the VERDICT-item closers;
    # diagnostics and 4K tails run only if time remains.

    # --- 1: evidence for the PUBLISHED devaug tables (the r5 jsonl that
    # first measured them was lost before commit). loader cell is
    # host-only (~2 min). ---
    out.append(dict(
        id="loader-bench-devaug-r5", tool="bench_loader.py",
        marker="LOADER_RESULT ", args=["--batches", "12"], env={},
        timeout=1800,
    ))
    for model, tag, prec in [("WIDERFACE-S", "S", "fp32"),
                             ("WIDERFACE-L", "L", "bf16")]:
        out.append(dict(
            id=f"trainstep-{tag}-{prec}-devaug-b64-480",
            tool="bench_train_step.py", marker="TRAIN_RESULT ",
            args=[model, "64", "480", "20", prec, "devaug"], env={},
            timeout=2400,
        ))

    # --- 2: quantized outputs (VERDICT #7) at the headline cell,
    # then the serving story's remaining re-measured baselines ---
    wall("qout-L-int8-1080", "WIDERFACE-L", "int8", 1080, 1920,
         kwargs={"output_dtype": "f16"})
    stream("sync-pack-L-int8-1080-fix", "WIDERFACE-L", "int8",
           1080, 1920, images=200, depth=1, mode="sync",
           kwargs={"pack_output": True})
    # quantized-output serving at the headline serving cell
    stream("stream-async-qout-L-int8-1080", "WIDERFACE-L", "int8",
           1080, 1920, images=300, depth=8, mode="stream-async",
           kwargs={"output_dtype": "f16", "pack_output": True})
    stream("stream-block-d8-L-int8-1080-fix", "WIDERFACE-L", "int8",
           1080, 1920, images=300, depth=8, mode="stream")
    stream("sync-S-bf16-480-fix", "WIDERFACE-S", "bf16",
           480, 640, images=200, depth=1, mode="sync")
    wall("qout-pack-L-int8-1080", "WIDERFACE-L", "int8", 1080, 1920,
         kwargs={"output_dtype": "f16", "pack_output": True})

    # --- 3: int8 knobs at the losing cells (VERDICT #3 flip attempts) ---
    wall("int8-bf16head-L-480", "WIDERFACE-L", "int8", 480, 640,
         kwargs={"int8_head_dtype": "bf16"})
    wall("int8-bf16head-M-720", "WIDERFACE-M", "int8", 720, 1280,
         kwargs={"int8_head_dtype": "bf16"})
    dev("dev-int8-bf16head-M-720", "WIDERFACE-M", "int8", 720, 1280,
        kwargs={"int8_head_dtype": "bf16"})

    # --- 4: TT100K-S 1080p (VERDICT #4): device baseline + knobs ---
    dev("dev-int8-TTS-1080", "TT100K-S", "int8", 1080, 1920)
    dev("dev-int8-approx-TTS-1080", "TT100K-S", "int8", 1080, 1920,
        kwargs={"approx_topk": True})
    out.append(dict(
        id="dev-int8-budget512-TTS-1080", tool="bench_device_cell.py",
        marker="DEVICE_RESULT ", args=["TT100K-S", "int8", "1080", "1920"],
        env={"LFD_BENCH_ENGINE_KWARGS":
             json.dumps({"pre_nms_points": 512, "nms_budget": 512})},
        timeout=1800,
    ))

    # --- 5: stream-block pack variant (the depth sweep itself landed) ---
    stream("stream-block-pack-d64-S-bf16-480", "WIDERFACE-S", "bf16",
           480, 640, images=200, depth=64, mode="stream",
           kwargs={"pack_output": True})

    # --- 6 (round-5 re-cut): the 4K flip attempts run EARLY — the
    # bf16-head knob already flipped L-480/M-720/S-720, making 4K M/L
    # the only remaining resolutions where int8 loses to our own bf16;
    # their attribution cells only run if these don't flip ---
    wall("int8-bf16head-L-2160", "WIDERFACE-L", "int8", 2160, 3840,
         loops=120, kwargs={"int8_head_dtype": "bf16"}, timeout=3600)
    wall("int8-bf16head-M-2160", "WIDERFACE-M", "int8", 2160, 3840,
         loops=120, kwargs={"int8_head_dtype": "bf16"}, timeout=3600)
    wall("int8-s2d-bf16head-L-2160", "WIDERFACE-L", "int8", 2160, 3840,
         loops=120, kwargs={"s2d_stem": True, "int8_head_dtype": "bf16"},
         timeout=3600)

    # --- 7: second-line cells: more TT100K knobs + qout-bf16 ---
    out.append(dict(
        id="dev-int8-budget256-TTS-1080", tool="bench_device_cell.py",
        marker="DEVICE_RESULT ", args=["TT100K-S", "int8", "1080", "1920"],
        env={"LFD_BENCH_ENGINE_KWARGS":
             json.dumps({"pre_nms_points": 256, "nms_budget": 256})},
        timeout=1800,
    ))
    wall("int8-approx-TTS-1080", "TT100K-S", "int8", 1080, 1920,
         kwargs={"approx_topk": True})
    wall("qout-L-bf16-1080", "WIDERFACE-L", "bf16", 1080, 1920,
         kwargs={"output_dtype": "f16"})
    dev("dev-bf16-approx-TTS-1080", "TT100K-S", "bf16", 1080, 1920,
        kwargs={"approx_topk": True})

    # --- 8: TT100K-S in-decode attribution (VERDICT #4 floor).
    # The L-480/M-720 int8 attribution groups were CUT in the round-5
    # re-cut: the bf16-head knob flipped both cells outright (L-480
    # 1.15 vs ref 1.50; M-720 3.01 vs ref 3.15), so there is no loss
    # left to attribute — the ~0.3 ms the knob removes IS the head
    # dequant stage. ---
    for stage in ("input", "stem", "backbone", "neck", "net", "full"):
        out.append(dict(
            id=f"attrib-int8-TTS-1080-{stage}", tool="bench_int8_attrib.py",
            marker="ATTRIB_RESULT ",
            args=["TT100K-S", "1080", "1920", stage], env={},
            timeout=2400,
        ))
    for stage in ("probs", "top1", "cand", "nms", "out"):
        out.append(dict(
            id=f"attrib-dec-TTS-1080-{stage}", tool="bench_decode_attrib.py",
            marker="ATTRIB_RESULT ",
            args=["TT100K-S", "1080", "1920", stage], env={},
            timeout=2400,
        ))

    # --- 9: 4K attribution tail (only if the 4K bf16-head cells in
    # group 6 did NOT flip and time remains) ---
    for stage in ("input", "stem", "backbone", "neck", "net", "full"):
        out.append(dict(
            id=f"attrib-int8-L-2160-{stage}", tool="bench_int8_attrib.py",
            marker="ATTRIB_RESULT ",
            args=["WIDERFACE-L", "2160", "3840", stage], env={},
            timeout=3600,
        ))

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
                if "error" in r:
                    continue
                done[r["id"]] = r
    return done


def load_extra(seen_ids):
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
    pending = [c for c in todo if c["id"] not in done]
    say(f"{len(todo)} cells total, {len(pending)} pending")
    seen = {c["id"] for c in todo} | set(done)
    wait_for_tunnel()
    while True:
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
            say(f"{cell['id']} errored AND tunnel is down — will retry")
            wait_for_tunnel()
            r = run_cell(cell)
        with open(OUT, "a") as f:
            f.write(json.dumps(r) + "\n")
        say(f"{cell['id']} -> " + json.dumps(
            {k: v for k, v in r.items() if k != "id"})[:300])
    say("campaign complete")


if __name__ == "__main__":
    main()
