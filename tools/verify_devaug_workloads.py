"""TPU verify drive for the LFD_DEVICE_AUG=1 workload wiring.

Runs the REAL TT100K and TrafficLight training entry points (the same
scripts a user runs) on tiny synthetic packs with device-side
augmentation enabled, on whatever backend the environment provides (the
real TPU chip under axon; CPU if JAX_PLATFORMS=cpu). Each run is the
verify skill's "executor-level" recipe: Executor(config_dict).run() for
2 epochs, then assert the 'Training finishes.' line, a finite loss in
the log, and the checkpoint file.

Prints `DRIVE_RESULT {json}` so tools/campaign_r5.py can run it as a
campaign cell (strictly serialized with the timing cells — two TPU
processes at once wedge each other, SKILL.md).
"""
import glob
import json
import os
import pickle
import re
import shutil
import subprocess
import sys
import tempfile
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, ".."))


def make_pack(path, n=8, hw=(300, 300)):
    rng = np.random.RandomState(0)
    samples = {}
    for i in range(n):
        img = (rng.rand(hw[0], hw[1], 3) * 255).astype(np.uint8)
        s = {"image": img}
        if i < n - 1:
            img[60:140, 50:150] = (230, 40, 40)  # a learnable blob
            s["bboxes"] = [[50, 60, 100, 80]]
            s["bbox_labels"] = [0]
        samples[i] = s
    with open(path, "wb") as f:
        pickle.dump([None, samples], f)


def run_workload(script_dir, script, pack_path, extra_env=None, crop=128):
    env = dict(os.environ)
    env.update(
        LFD_DEVICE_AUG="1",
        LFD_EPOCHS="2",
        LFD_BATCH_SIZE="4",
        LFD_NUM_WORKERS="1",
        LFD_DATASET_PATH=str(pack_path),
        LFD_CROP_SIZE=str(crop),
    )
    env.update(extra_env or {})
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, script], cwd=script_dir, env=env,
        capture_output=True, text=True, timeout=1500,
    )
    text = out.stdout + out.stderr
    base = script.split(".")[0]
    work_dirs = sorted(glob.glob(os.path.join(script_dir, base + "_work_dir_*")))
    losses, ckpts = [], []
    for d in work_dirs:
        for logf in glob.glob(os.path.join(d, "log_*.log")):
            losses += [float(m) for m in
                       re.findall(r"loss:\s*([0-9.]+)", open(logf).read())]
        ckpts += glob.glob(os.path.join(d, "*.ckpt")) + \
            glob.glob(os.path.join(d, "epoch_*"))
    for d in work_dirs:
        shutil.rmtree(d, ignore_errors=True)
    assert out.returncode == 0, (script, text[-2500:])
    assert "Training finishes." in text, (script, text[-2500:])
    assert losses and np.isfinite(losses[-1]), (script, losses[:5])
    assert ckpts, (script, work_dirs)
    return dict(seconds=round(time.time() - t0, 1),
                first_loss=losses[0], last_loss=losses[-1],
                n_ckpts=len(ckpts))


def main():
    tmp = tempfile.mkdtemp(prefix="devaug_drive_")
    res = {}
    try:
        tt_pack = os.path.join(tmp, "tt100k.pkl")
        make_pack(tt_pack)
        res["tt100k_devaug"] = run_workload(
            os.path.join(REPO, "workloads", "TT100K_train"),
            "TT100K_LFD_S.py", tt_pack)
        tl_pack = os.path.join(tmp, "tl_train.pkl")
        make_pack(tl_pack)
        res["trafficlight_devaug"] = run_workload(
            os.path.join(REPO, "workloads", "TrafficLight_train"),
            "TL_LFD_S.py", tl_pack)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print("DRIVE_RESULT " + json.dumps(res))


if __name__ == "__main__":
    main()
