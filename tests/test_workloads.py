# Workload entry-point smoke test: the config-as-code WIDERFACE script must
# train end-to-end on a tiny synthetic pack (env-var overrides).
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest


@pytest.mark.slow
def test_widerface_workload_script_runs(tmp_path):
    # tiny synthetic "widerface" pack: 6 images with one face box each
    rng = np.random.RandomState(0)
    samples = {}
    for i in range(6):
        img = (rng.rand(96, 96, 3) * 255).astype(np.uint8)
        s = {"image": img}
        if i < 5:
            s["bboxes"] = [[20, 20, 30, 30]]
            s["bbox_labels"] = [0]
        samples[i] = s
    pack_path = tmp_path / "pack.pkl"
    with open(pack_path, "wb") as f:
        pickle.dump([None, samples], f)

    env = dict(os.environ)
    env.update(
        LFD_EPOCHS="1",
        LFD_BATCH_SIZE="2",
        LFD_NUM_WORKERS="1",
        LFD_DATASET_PATH=str(pack_path),
        JAX_PLATFORMS="cpu",
    )
    script_dir = os.path.join(os.path.dirname(__file__), "..", "workloads", "WIDERFACE_train")
    result = subprocess.run(
        [sys.executable, "WIDERFACE_LFD_XS.py"],
        cwd=script_dir, env=env, capture_output=True, text=True, timeout=900,
    )
    # clean up the work dir the script creates inside workloads/
    import glob
    import shutil

    for d in glob.glob(os.path.join(script_dir, "WIDERFACE_LFD_XS_work_dir_*")):
        shutil.rmtree(d, ignore_errors=True)
    assert result.returncode == 0, result.stderr[-3000:]
    assert "Training finishes." in result.stderr + result.stdout
