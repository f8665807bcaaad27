"""LFD_DEVICE_AUG=1 wiring in the TT100K and TrafficLight workloads.

The WIDERFACE workload's device-aug path is covered by
test_device_aug.py + test_execution.py; these tests pin the OTHER two
workload families' gated configs: TT100K must NOT flip (signs are not
left-right symmetric) and must normalize with simple_normalize's
constants; TrafficLight must flip AND fold BGR2RGB + imagenet
normalization into the device stage.
"""
import importlib.util
import os
import pickle
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

REPO = os.path.join(os.path.dirname(__file__), "..")


def _tiny_pack(path, n=6, hw=(300, 300)):
    rng = np.random.RandomState(0)
    samples = {}
    for i in range(n):
        img = (rng.rand(hw[0], hw[1], 3) * 255).astype(np.uint8)
        s = {"image": img}
        if i < n - 1:
            s["bboxes"] = [[40, 40, 60, 60]]
            s["bbox_labels"] = [0]
        samples[i] = s
    with open(path, "wb") as f:
        pickle.dump([None, samples], f)


def _import_script(workload_dir, fname, mod_name):
    d = os.path.join(REPO, "workloads", workload_dir)
    sys.path.insert(0, d)
    try:
        spec = importlib.util.spec_from_file_location(
            mod_name, os.path.join(d, fname))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path.remove(d)


def _probe(device_augment, buffer_size, crop, color_bgr):
    """Run the workload's composed device-aug fn on a solid-color window
    at scale 1 / no translation / no flip: every output pixel must be
    normalize(color), so the normalization constants and any channel swap
    are directly observable."""
    buf = np.zeros((1, buffer_size, buffer_size, 3), np.uint8)
    buf[:] = np.asarray(color_bgr, np.uint8)
    batch = {
        "buffer": jnp.asarray(buf),
        "scale": jnp.ones((1, 2), jnp.float32),
        "translation": jnp.zeros((1, 2), jnp.float32),
        "flip": jnp.zeros((1,), jnp.float32),
    }
    out = np.asarray(jax.jit(device_augment)(batch))
    assert out.shape == (1, crop, crop, 3)
    return out[0, crop // 2, crop // 2]


def test_tt100k_device_aug_wiring(tmp_path, monkeypatch):
    from lfdtpu.data import DeviceAugRegionSampler

    pack = tmp_path / "tt100k.pkl"
    _tiny_pack(pack)
    monkeypatch.setenv("LFD_DEVICE_AUG", "1")
    monkeypatch.setenv("LFD_DATASET_PATH", str(pack))
    monkeypatch.setenv("LFD_BATCH_SIZE", "2")
    monkeypatch.setenv("LFD_NUM_WORKERS", "1")
    monkeypatch.setenv("LFD_CROP_SIZE", "96")
    common = _import_script("TT100K_train", "_common.py", "_tt100k_common")
    cfg = {}
    common.prepare_data_pipeline(cfg)

    loader = cfg["train_data_loader"]
    rs = loader._region_sampler
    assert isinstance(rs, DeviceAugRegionSampler)
    assert rs._flip_p == 0.0  # TT100K never flips
    assert "device_augment" in cfg

    # simple_normalize constants, NO channel swap: (c - 127.5) / 127.5
    px = _probe(cfg["device_augment"], rs.buffer_size, 96, (30, 120, 240))
    np.testing.assert_allclose(
        px, (np.array([30, 120, 240]) - 127.5) / 127.5, atol=2e-2)

    # the loader actually ships the aug pytree and the fn consumes it
    batch = next(iter(loader))
    assert batch["images"].dtype == np.uint8
    images = dict(buffer=batch["images"], scale=batch["aug_scale"],
                  translation=batch["aug_translation"],
                  flip=batch["aug_flip"])
    out = np.asarray(jax.jit(cfg["device_augment"])(
        jax.tree.map(jnp.asarray, images)))
    assert out.shape == (2, 96, 96, 3)


@pytest.mark.parametrize("fname", ["TL_LFD_S.py", "TL_LFD_L.py"])
def test_trafficlight_device_aug_wiring(tmp_path, monkeypatch, fname):
    from lfdtpu.data import DeviceAugRegionSampler

    os.makedirs(tmp_path / "TL_pack", exist_ok=True)
    _tiny_pack(tmp_path / "TL_pack" / "tl_train.pkl")
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("LFD_DEVICE_AUG", "1")
    mod = _import_script("TrafficLight_train", fname,
                         f"_tl_{fname.split('.')[0].lower()}")
    mod.config_dict.clear()
    mod.prepare_data_pipeline()
    cfg = mod.config_dict

    rs = cfg["train_data_loader"]._region_sampler
    assert isinstance(rs, DeviceAugRegionSampler)
    assert rs._flip_p == 0.5  # the TL pipeline flips
    assert "device_augment" in cfg

    # BGR2RGB THEN imagenet normalize, exactly like the host
    # tl_train_pipeline (Compose([HorizontalFlip, BGR2RGB, standard_
    # normalize])): a (B,G,R)=(30,120,240) pixel must come out as the
    # normalized (240,120,30) RGB value.
    px = _probe(cfg["device_augment"], rs.buffer_size, 640, (30, 120, 240))
    mean = np.array([0.485, 0.456, 0.406]) * 255
    std = np.array([0.229, 0.224, 0.225]) * 255
    np.testing.assert_allclose(
        px, (np.array([240, 120, 30]) - mean) / std, atol=2e-2)
