# Engine serialization round-trip (the TRT engine-file analogue,
# reference `build_engine.py:141-152` / `predict_tensorrt.py` deserialize).

import numpy as np
import jax

from lfdtpu.deploy.compile import compile_inference, make_device_preprocess
from lfdtpu.deploy.engine_io import load_engine, save_engine
from lfdtpu.zoo import ZOO


def test_engine_save_load_roundtrip(tmp_path):
    det = ZOO["WIDERFACE-XS"]()
    variables = det.init(jax.random.PRNGKey(0), input_hw=(64, 64), train=False)
    pre = make_device_preprocess((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    engine = compile_inference(det, variables, (64, 64), precision="fp32",
                               preprocess=pre)

    img = np.random.RandomState(0).randint(0, 255, (1, 64, 64, 3), dtype=np.uint8)
    ref = engine(img, (60, 64))

    path = tmp_path / "xs.lfde"
    save_engine(engine, str(path))
    assert path.exists() and path.stat().st_size > 1000

    loaded = load_engine(str(path))
    assert loaded.precision_mode == "fp32"
    assert loaded.input_resolution == (64, 64)
    got = loaded(img, (60, 64))

    for k in ref:
        a, b = np.asarray(ref[k]), np.asarray(got[k])
        assert a.shape == b.shape, k
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5, err_msg=k)


def test_engine_loads_in_fresh_process(tmp_path):
    """Deserialization must work in a process that never builds the model
    (the reference's predict_tensorrt.py workflow: ship the engine file)."""
    import os
    import subprocess
    import sys
    import textwrap

    det = ZOO["WIDERFACE-XS"]()
    variables = det.init(jax.random.PRNGKey(0), input_hw=(64, 64), train=False)
    engine = compile_inference(det, variables, (64, 64), precision="fp32",
                               preprocess=make_device_preprocess(
                                   (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)))
    img = np.random.RandomState(0).randint(0, 255, (1, 64, 64, 3), dtype=np.uint8)
    ref = engine(img, (60, 64))
    path = tmp_path / "xs.lfde"
    save_engine(engine, str(path))

    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    src = textwrap.dedent(f"""
        import sys
        import numpy as np
        import jax
        jax.config.update("jax_platforms", "cpu")
        sys.path.insert(0, {repo!r})
        from lfdtpu.deploy.engine_io import load_engine
        eng = load_engine({str(path)!r})
        img = np.random.RandomState(0).randint(0, 255, (1, 64, 64, 3), dtype=np.uint8)
        out = eng(img, (60, 64))
        print("COUNT", int(np.asarray(out["count"])[0]))
        print("SUM", float(np.abs(np.asarray(out["boxes"])).sum()))
    """)
    script = tmp_path / "load_only.py"
    script.write_text(src)
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    out = subprocess.run([sys.executable, str(script)], env=env,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-3000:]
    lines = dict(l.split(" ", 1) for l in out.stdout.splitlines() if " " in l)
    assert int(lines["COUNT"]) == int(np.asarray(ref["count"])[0])
    np.testing.assert_allclose(
        float(lines["SUM"]), float(np.abs(np.asarray(ref["boxes"])).sum()),
        rtol=1e-4,
    )


def test_int8_engine_save_load_roundtrip(tmp_path):
    """int8 engines carry extra device constants (per-channel weight
    scales, pre-quantized int8 kernels) — serialization must cover them."""
    from lfdtpu.deploy import quantize_variables_int8

    det = ZOO["WIDERFACE-XS"]()
    variables = det.init(jax.random.PRNGKey(0), input_hw=(64, 64), train=False)
    variables = quantize_variables_int8(variables)
    engine = compile_inference(det, variables, (64, 64), precision="int8",
                               preprocess=make_device_preprocess(
                                   (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)))
    img = np.random.RandomState(1).randint(0, 255, (1, 64, 64, 3), dtype=np.uint8)
    ref = engine(img, (64, 64))

    path = tmp_path / "xs_int8.lfde"
    save_engine(engine, str(path))
    got = load_engine(str(path))(img, (64, 64))
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(ref[k]), np.asarray(got[k]), rtol=1e-5, atol=1e-5,
            err_msg=k,
        )


def test_int8_bf16_head_engine_save_load(tmp_path):
    """int8 engines with the bf16 float remainder (int8_head_dtype) carry
    bf16 weight constants through the engine file container."""
    det = ZOO["WIDERFACE-XS"]()
    variables = det.init(jax.random.PRNGKey(0), input_hw=(64, 64), train=False)
    engine = compile_inference(det, variables, (64, 64), precision="int8",
                               preprocess=make_device_preprocess(
                                   (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
                               int8_head_dtype="bf16")
    img = np.random.RandomState(2).randint(0, 255, (1, 64, 64, 3), dtype=np.uint8)
    ref = engine(img, (64, 64))

    path = tmp_path / "xs_int8_bfh.lfde"
    save_engine(engine, str(path))
    got = load_engine(str(path))(img, (64, 64))
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(ref[k]), np.asarray(got[k]), rtol=1e-3, atol=1e-3,
            err_msg=k,
        )


def test_batch_engine_save_load_per_image_extents(tmp_path):
    """Batch engines serialize with (B, 2) per-image valid extents; a
    loaded engine accepts both per-image (B, 2) and shared (2,) valid_hw
    (broadcast), matching the in-process engine."""
    from lfdtpu.deploy.compile import make_device_preprocess

    det = ZOO["WIDERFACE-XS"]()
    variables = det.init(jax.random.PRNGKey(0), input_hw=(64, 64), train=False)
    pre = make_device_preprocess((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    engine = compile_inference(det, variables, (64, 64), precision="fp32",
                               preprocess=pre, batch_size=2,
                               classification_threshold=0.01)
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    hws = np.asarray([[60, 64], [64, 48]], np.float32)
    ref = engine(imgs, hws)

    path = tmp_path / "xs_b2.lfde"
    save_engine(engine, str(path))
    loaded = load_engine(str(path))
    got = loaded(imgs, hws)
    for k in ref:
        np.testing.assert_allclose(np.asarray(ref[k]), np.asarray(got[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)

    # shared (2,) extent broadcasts over the batch
    ref_shared = engine(imgs, np.asarray([60.0, 64.0]))
    got_shared = loaded(imgs, np.asarray([60.0, 64.0]))
    for k in ref_shared:
        np.testing.assert_allclose(np.asarray(ref_shared[k]),
                                   np.asarray(got_shared[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)
