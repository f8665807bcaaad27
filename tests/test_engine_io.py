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
