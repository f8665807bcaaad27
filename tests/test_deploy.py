# Deployment tests: engine precisions agree, latency harness runs,
# int8 fake-quant stays close, device preprocess matches host normalize.
import jax
import jax.numpy as jnp
import numpy as np

from lfdtpu.deploy import (
    Int8Calibrator,
    cast_variables,
    compile_inference,
    make_device_preprocess,
    quantize_variables_int8,
    timing_inference,
)
from lfdtpu.data.augmentation import simple_normalize

from tests.test_detector import tiny_lfd


def _engine_setup():
    det = tiny_lfd()
    variables = det.init(jax.random.PRNGKey(0), (64, 64))
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (1, 64, 64, 3)).astype(np.uint8)
    return det, variables, img


def test_engine_fp32_vs_bf16_close():
    det, variables, img = _engine_setup()
    pre = make_device_preprocess((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    vhw = jnp.asarray([64.0, 64.0])
    e32 = compile_inference(det, variables, (64, 64), "fp32", preprocess=pre,
                            classification_threshold=0.01)
    e16 = compile_inference(det, variables, (64, 64), "bf16", preprocess=pre,
                            classification_threshold=0.01)
    d32 = e32(jnp.asarray(img), vhw)
    d16 = e16(jnp.asarray(img), vhw)
    # same top score to bf16 tolerance
    np.testing.assert_allclose(
        np.asarray(d32["scores"][0, 0]), np.asarray(d16["scores"][0, 0]), atol=0.05
    )


def test_int8_quantize_close():
    det, variables, img = _engine_setup()
    q = quantize_variables_int8(variables)
    # kernels changed but only slightly
    k0 = jax.tree.leaves(variables["params"])[0]
    q0 = jax.tree.leaves(q["params"])[0]
    assert not np.allclose(np.asarray(k0), np.asarray(q0))
    rel = np.abs(np.asarray(k0) - np.asarray(q0)).max() / (np.abs(np.asarray(k0)).max() + 1e-9)
    assert rel < 0.02  # <= 1/127 rounding


def test_int8_calibrator_cache(tmp_path):
    cache = str(tmp_path / "calib.npy")
    c = Int8Calibrator(cache)
    assert not c.has_cache()
    c.update(np.full((1, 4, 4, 3), 3.0))
    c.update(np.full((1, 4, 4, 3), -7.0))
    assert c.input_amax == 7.0
    c.save()
    c2 = Int8Calibrator(cache)
    assert c2.has_cache() and c2.input_amax == 7.0


def test_device_preprocess_matches_host_normalize(rng):
    img = (rng.rand(8, 8, 3) * 255).astype(np.uint8)
    host = simple_normalize({"image": img.copy()})["image"]
    pre = make_device_preprocess((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    dev = np.asarray(pre(jnp.asarray(img)))
    np.testing.assert_allclose(dev, host, atol=1e-5)


def test_timing_inference_runs():
    det, variables, img = _engine_setup()
    engine = compile_inference(det, variables, (64, 64), "fp32")
    r = timing_inference(engine, img, (64.0, 64.0), warmup_loops=1, timing_loops=3)
    assert r["ms_per_image"] > 0 and r["fps"] > 0


def test_device_time_inference_runs():
    from lfdtpu.deploy.latency import device_time_inference

    det, variables, img = _engine_setup()
    engine = compile_inference(det, variables, (64, 64), "fp32")
    r = device_time_inference(engine, img, (64.0, 64.0), loops=(2, 4), reps=1)
    assert np.isfinite(r["ms_device"]) and r["s_n2"] > 0


def test_cast_variables_dtype():
    det, variables, _ = _engine_setup()
    b = cast_variables(variables, jnp.bfloat16)
    for leaf in jax.tree.leaves(b):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.bfloat16


def test_int8_true_path_runs_and_is_close(rng):
    from lfdtpu.deploy.int8_net import calibrate_activation_scales, int8_apply

    det, variables, img = _engine_setup()
    x = jnp.asarray(img.astype(np.float32) / 255.0)

    ref_cls, ref_reg = det.net.apply(variables, x, train=False)

    # dynamic activation scales
    cls_d, reg_d = jax.jit(
        lambda v, x: int8_apply(det, v, x)
    )(variables, x)
    assert cls_d.shape == ref_cls.shape
    # int8 is lossy but must correlate strongly with f32
    cc = np.corrcoef(np.asarray(cls_d).ravel(), np.asarray(ref_cls).ravel())[0, 1]
    assert cc > 0.98, cc

    # calibrated static scales
    scales = calibrate_activation_scales(det, variables, [np.asarray(x)])
    assert len(scales) > 5
    cls_s, reg_s = jax.jit(
        lambda v, x: int8_apply(det, v, x, act_scales=scales)
    )(variables, x)
    cc2 = np.corrcoef(np.asarray(cls_s).ravel(), np.asarray(ref_cls).ravel())[0, 1]
    assert cc2 > 0.98, cc2


def test_int8_fused_chain_close_and_stays_int8(rng):
    """The engine int8 path (fused chain): close to f32, int8 convs with a
    single epilogue actually present (backbone convs carry
    preferred_element_type=int32), prequantized and trace-time-quantized
    kernels agree."""
    from lfdtpu.deploy.int8_net import calibrate_module_amax, int8_fused_apply

    det, variables, img = _engine_setup()
    pre = make_device_preprocess((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    amax = calibrate_module_amax(det, variables, [img], preprocess=pre)
    assert any(k.endswith("#out") for k in amax) and "__input__#out" in amax

    x = pre(jnp.asarray(img)).astype(jnp.float32)
    ref_cls, ref_reg = det.net.apply(variables, x, train=False)

    fused = lambda v, xx: int8_fused_apply(det.net, v, xx, amax)
    cls8, reg8 = jax.jit(fused)(variables, x)
    # slightly looser than the legacy per-conv path's 0.98: the fused chain
    # requantizes each edge from the previous int8 result (TRT-style), so
    # rounding noise compounds across the ~10 edges of this random-init net
    cc = np.corrcoef(np.asarray(cls8).ravel(), np.asarray(ref_cls).ravel())[0, 1]
    assert cc > 0.95, cc
    cc_r = np.corrcoef(np.asarray(reg8).ravel(), np.asarray(ref_reg).ravel())[0, 1]
    assert cc_r > 0.95, cc_r
    # correlation is scale-invariant — also pin the MAGNITUDE (catches a
    # dropped dequant: raw int8 kernels once inflated reg by ~8000x here)
    for got, ref in ((cls8, ref_cls), (reg8, ref_reg)):
        ratio = float(jnp.mean(jnp.abs(got)) / jnp.mean(jnp.abs(ref)))
        assert 0.8 < ratio < 1.25, ratio

    # the backbone+neck convs must be real int8 x int8 -> int32 convs
    txt = str(jax.make_jaxpr(fused)(variables, x))
    assert txt.count("preferred_element_type=int32") >= 8, txt.count(
        "preferred_element_type=int32"
    )


def test_int8_engine_end_to_end():
    det, variables, img = _engine_setup()
    pre = make_device_preprocess((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    eng = compile_inference(det, variables, (64, 64), "int8", preprocess=pre,
                            classification_threshold=0.01)
    out = eng(jnp.asarray(img), jnp.asarray([64.0, 64.0]))
    assert int(out["count"][0]) >= 0
    assert np.isfinite(np.asarray(out["scores"])).all()


def test_predict_with_engine_method():
    det, variables, img = _engine_setup()
    pre = make_device_preprocess((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    eng = compile_inference(det, variables, (64, 64), "fp32", preprocess=pre,
                            classification_threshold=0.01)
    res = det.predict_for_single_image_with_engine(eng, img[0][:48, :56])
    assert isinstance(res, list)
    for row in res:
        assert len(row) == 6


def test_split_engine_matches_single_program():
    """Two-program engine (stem program | body+decode program) returns the
    SAME detections as the single-program engine — the split exists purely
    to change XLA layout assignment at the boundary (compile.py `split`)."""
    det, variables, img = _engine_setup()
    pre = make_device_preprocess((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    vhw = jnp.asarray([64.0, 64.0])
    base = compile_inference(det, variables, (64, 64), "fp32", preprocess=pre,
                             classification_threshold=0.01)
    split = compile_inference(det, variables, (64, 64), "fp32", preprocess=pre,
                              classification_threshold=0.01, split=True)
    assert split.is_split
    a = base(jnp.asarray(img), vhw)
    b = split(jnp.asarray(img), vhw)
    assert int(a["count"][0]) == int(b["count"][0])
    n = int(a["count"][0])
    np.testing.assert_allclose(np.asarray(a["boxes"][0, :n]),
                               np.asarray(b["boxes"][0, :n]), rtol=1e-5,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(a["scores"][0, :n]),
                               np.asarray(b["scores"][0, :n]), rtol=1e-5,
                               atol=1e-5)


def _fast_stem_lfd():
    """Smallest LFD with a pallas-stem-eligible backbone (stem_mode='fast'
    -> stem0 = ConvNormAct(64, k3, s2) on 3 channels)."""
    from lfdtpu.models import LFD, LFDHead, LFDResNet, SimpleNeck
    from lfdtpu.ops.loss_wrappers import FocalLoss, IoULoss

    bb = LFDResNet(
        block_mode="faster", stem_mode="fast", body_mode=None,
        stem_channels=64, body_architecture=(1, 1), body_channels=(64, 64),
        out_indices=((0, 0), (1, 0)), norm_cfg=dict(type="BatchNorm2d"),
    )
    neck = SimpleNeck(num_neck_channels=32,
                      num_input_strides_list=tuple(bb.num_output_strides_list),
                      norm_cfg=dict(type="BatchNorm2d"))
    head = LFDHead(
        num_classes=1, num_heads=2, num_head_channels=32,
        num_conv_layers=1, norm_cfg=dict(type="GroupNorm", num_groups=8),
        share_head_flag=True, merge_path_flag=True,
        classification_loss_type="FocalLoss",
        regression_loss_type="IoULoss",
    )
    return LFD(
        backbone=bb, neck=neck, head=head, num_classes=1,
        regression_ranges=((0, 32), (32, 64)),
        point_strides=tuple(bb.num_output_strides_list),
        classification_loss_func=FocalLoss(),
        regression_loss_func=IoULoss(),
    )


def test_pallas_stem_engine_matches_base():
    """compile_inference(pallas_stem=True): the fused uint8 stem kernel
    (normalize + conv + BN + ReLU in one pallas_call) produces the same
    detections as the XLA bf16 engine (interpret mode on CPU)."""
    from jax.experimental.pallas import tpu as pltpu

    det = _fast_stem_lfd()
    variables = det.init(jax.random.PRNGKey(0), (64, 64))
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (1, 64, 64, 3)).astype(np.uint8)
    pre = make_device_preprocess((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    vhw = jnp.asarray([64.0, 64.0])
    base = compile_inference(det, variables, (64, 64), "bf16", preprocess=pre,
                             classification_threshold=0.01)
    stem = compile_inference(det, variables, (64, 64), "bf16", preprocess=pre,
                             classification_threshold=0.01, pallas_stem=True)
    a = base(jnp.asarray(img), vhw)
    with pltpu.force_tpu_interpret_mode():
        b = stem(jnp.asarray(img), vhw)
    # bf16 rounding differs slightly between the two stem formulations;
    # scores of the surviving detections must stay close
    na, nb = int(a["count"][0]), int(b["count"][0])
    assert abs(na - nb) <= 1, (na, nb)
    n = min(na, nb)
    np.testing.assert_allclose(np.asarray(a["scores"][0, :n]),
                               np.asarray(b["scores"][0, :n]), atol=0.04)


def test_pallas_stem_requires_eligible_net():
    det, variables, img = _engine_setup()  # 'fastest' stem: ineligible
    pre = make_device_preprocess((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    try:
        compile_inference(det, variables, (64, 64), "bf16", preprocess=pre,
                          pallas_stem=True)
    except ValueError as e:
        assert "stem0" in str(e)
    else:
        raise AssertionError("expected ValueError for ineligible stem")


def test_s2d_stem_apply_exact_vs_lax():
    """Space-to-depth folded stem (deploy/s2d_net.py) against the plain
    formulation: normalize -> 3x3/s2/pad1 conv -> BN affine -> ReLU.
    Random weights/BN/mean/std, f32, boundary-heavy small image — the
    padding corrections must make the transform exact."""
    from lfdtpu.deploy.s2d_net import prepack_s2d_stem, s2d_stem_apply
    from lfdtpu.models.layers import BN_EPS

    rng = np.random.RandomState(7)
    h, w, co = 10, 14, 32
    x = rng.randint(0, 255, (2, h, w, 3)).astype(np.uint8)
    k = rng.randn(3, 3, 3, co).astype(np.float32) * 0.1
    mean = np.array([120.0, 115.0, 110.0], np.float32)
    std = np.array([60.0, 58.0, 62.0], np.float32)
    bn_scale = rng.rand(co).astype(np.float32) + 0.5
    bn_bias = rng.randn(co).astype(np.float32) * 0.1
    bn_mean = rng.randn(co).astype(np.float32) * 0.1
    bn_var = rng.rand(co).astype(np.float32) + 0.2

    for bgr2rgb in (False, True):
        xn = x.astype(np.float32)
        if bgr2rgb:
            xn = xn[..., ::-1]
        xn = (xn - mean) / std
        ref = jax.lax.conv_general_dilated(
            jnp.asarray(xn), jnp.asarray(k), (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        g = bn_scale / np.sqrt(bn_var + BN_EPS)
        ref = np.asarray(ref) * g + (bn_bias - bn_mean * g)
        ref = np.maximum(ref, 0.0)

        variables = {
            "params": {"backbone": {"stem0": {
                "Conv_0": {"kernel": k},
                "Norm_0": {"BatchNorm_0": {"scale": bn_scale, "bias": bn_bias}},
            }}},
            "batch_stats": {"backbone": {"stem0": {
                "Norm_0": {"BatchNorm_0": {"mean": bn_mean, "var": bn_var}},
            }}},
        }
        pack = prepack_s2d_stem(variables, mean, std, bgr2rgb=bgr2rgb,
                                compute_dtype=jnp.float32)
        got = np.asarray(s2d_stem_apply(jnp.asarray(x), pack))
        assert got.shape == ref.shape, (got.shape, ref.shape)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_s2d_stem_engine_matches_base():
    """compile_inference(s2d_stem=True): identical detections to the plain
    fp32 engine (the transform is exact; only summation order differs)."""
    det = _fast_stem_lfd()
    variables = det.init(jax.random.PRNGKey(0), (64, 64))
    rng = np.random.RandomState(4)
    img = rng.randint(0, 255, (1, 64, 64, 3)).astype(np.uint8)
    pre = make_device_preprocess((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    vhw = jnp.asarray([64.0, 64.0])
    base = compile_inference(det, variables, (64, 64), "fp32", preprocess=pre,
                             classification_threshold=0.01)
    s2d = compile_inference(det, variables, (64, 64), "fp32", preprocess=pre,
                            classification_threshold=0.01, s2d_stem=True)
    a = base(jnp.asarray(img), vhw)
    b = s2d(jnp.asarray(img), vhw)
    assert int(a["count"][0]) == int(b["count"][0])
    n = int(a["count"][0])
    np.testing.assert_allclose(np.asarray(a["boxes"][0, :n]),
                               np.asarray(b["boxes"][0, :n]), rtol=1e-4,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(a["scores"][0, :n]),
                               np.asarray(b["scores"][0, :n]), atol=1e-4)


def test_s2d_stem_engine_serializes(tmp_path):
    """s2d engines round-trip through engine files (the pack rides the
    consts pytree)."""
    from lfdtpu.deploy import load_engine, save_engine

    det = _fast_stem_lfd()
    variables = det.init(jax.random.PRNGKey(0), (64, 64))
    rng = np.random.RandomState(5)
    img = rng.randint(0, 255, (1, 64, 64, 3)).astype(np.uint8)
    pre = make_device_preprocess((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    vhw = jnp.asarray([64.0, 64.0])
    eng = compile_inference(det, variables, (64, 64), "bf16", preprocess=pre,
                            classification_threshold=0.01, s2d_stem=True)
    a = eng(jnp.asarray(img), vhw)
    p = tmp_path / "s2d.lfde"
    save_engine(eng, str(p))
    b = load_engine(str(p))(jnp.asarray(img), vhw)
    assert int(a["count"][0]) == int(b["count"][0])
    n = int(a["count"][0])
    np.testing.assert_allclose(np.asarray(a["boxes"][0, :n]),
                               np.asarray(b["boxes"][0, :n]), atol=1e-3)


def test_s2d_stem_composes_with_split():
    """split=True + s2d_stem=True: program 1 = s2d stem, program 2 = body;
    detections match the plain single-program engine."""
    det = _fast_stem_lfd()
    variables = det.init(jax.random.PRNGKey(0), (64, 64))
    rng = np.random.RandomState(6)
    img = rng.randint(0, 255, (1, 64, 64, 3)).astype(np.uint8)
    pre = make_device_preprocess((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    vhw = jnp.asarray([64.0, 64.0])
    base = compile_inference(det, variables, (64, 64), "fp32", preprocess=pre,
                             classification_threshold=0.01)
    both = compile_inference(det, variables, (64, 64), "fp32", preprocess=pre,
                             classification_threshold=0.01, s2d_stem=True,
                             split=True)
    a = base(jnp.asarray(img), vhw)
    b = both(jnp.asarray(img), vhw)
    assert int(a["count"][0]) == int(b["count"][0])
    n = int(a["count"][0])
    np.testing.assert_allclose(np.asarray(a["boxes"][0, :n]),
                               np.asarray(b["boxes"][0, :n]), atol=1e-3)


def test_s2d_stem_composes_with_int8():
    """int8 + s2d_stem (round 4): the s2d folded stem feeds the fused int8
    chain (stem0 skipped, first block statically quantizes from its own
    calibrated amax). The composed engine's raw net outputs must correlate
    with the plain fused-int8 chain's — and both with f32 — since the only
    difference is stem0 running exact-f32 (s2d) vs int8."""
    from lfdtpu.deploy.int8_net import calibrate_module_amax

    det = _fast_stem_lfd()
    variables = det.init(jax.random.PRNGKey(0), (64, 64))
    rng = np.random.RandomState(7)
    img = rng.randint(0, 255, (1, 64, 64, 3)).astype(np.uint8)
    pre = make_device_preprocess((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    vhw = jnp.asarray([64.0, 64.0])
    amax = calibrate_module_amax(det, variables, [img], preprocess=pre)
    plain = compile_inference(det, variables, (64, 64), "int8", preprocess=pre,
                              classification_threshold=0.01, act_scales=amax)
    comp = compile_inference(det, variables, (64, 64), "int8", preprocess=pre,
                             classification_threshold=0.01, act_scales=amax,
                             s2d_stem=True)
    a = plain(jnp.asarray(img), vhw)
    b = comp(jnp.asarray(img), vhw)
    # near-threshold detections may differ between the two stem paths on a
    # random-init net; the scored candidates must correlate strongly
    sa = np.sort(np.asarray(a["scores"]).ravel())[::-1][:32]
    sb = np.sort(np.asarray(b["scores"]).ravel())[::-1][:32]
    np.testing.assert_allclose(sa, sb, atol=0.05)
    # the composed program still carries the int8 backbone convs
    fn, consts = comp.export_parts()
    txt = str(jax.make_jaxpr(lambda im, v: fn(*consts, im, v))(
        jnp.asarray(img), vhw))
    assert txt.count("preferred_element_type=int32") >= 2


def test_int8_engine_bf16_head():
    """int8_head_dtype='bf16': the float remainder (GroupNorm head) runs
    bf16 after the int8 backbone; detections stay close to the f32-head
    int8 engine (scores differ only by bf16 rounding)."""
    from lfdtpu.deploy.int8_net import calibrate_module_amax

    det, variables, img = _engine_setup()
    pre = make_device_preprocess((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    vhw = jnp.asarray([64.0, 64.0])
    amax = calibrate_module_amax(det, variables, [img], preprocess=pre)
    plain = compile_inference(det, variables, (64, 64), "int8", preprocess=pre,
                              classification_threshold=0.01, act_scales=amax)
    bfh = compile_inference(det, variables, (64, 64), "int8", preprocess=pre,
                            classification_threshold=0.01, act_scales=amax,
                            int8_head_dtype="bf16")
    a = plain(jnp.asarray(img), vhw)
    b = bfh(jnp.asarray(img), vhw)
    sa = np.sort(np.asarray(a["scores"]).ravel())[::-1][:32]
    sb = np.sort(np.asarray(b["scores"]).ravel())[::-1][:32]
    np.testing.assert_allclose(sa, sb, atol=0.05)


def test_int8_fused_apply_capture_hook():
    """int8_fused_apply(capture=...): named module outputs are recorded
    during the trace (the attribution benchmark's DCE-truncation hook)."""
    from lfdtpu.deploy.int8_net import calibrate_module_amax, int8_fused_apply

    det, variables, img = _engine_setup()
    pre = make_device_preprocess((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    amax = calibrate_module_amax(det, variables, [img], preprocess=pre)
    x = pre(jnp.asarray(img)).astype(jnp.float32)
    capture = {"backbone": None, "neck": None}
    cls8, reg8 = int8_fused_apply(det.net, variables, x, amax, capture=capture)
    assert capture["backbone"] is not None and capture["neck"] is not None
    # captured values are real traced outputs, not placeholders
    for v in jax.tree.leaves(capture["backbone"]):
        assert hasattr(v, "shape")


def test_spmd_mesh_engine_matches_single_device():
    """compile_inference(mesh=...): the SPMD engine (image height sharded
    over the `spatial` axis, GSPMD halo exchanges) returns the same
    detections as the single-device engine. Runs on the 8-virtual-device
    CPU mesh from conftest; the program is topology-generic."""
    import pytest

    from lfdtpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    det, variables, img = _engine_setup()
    pre = make_device_preprocess((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    vhw = jnp.asarray([60.0, 57.0])  # exercise point masking under sharding
    base = compile_inference(det, variables, (64, 64), "fp32", preprocess=pre,
                             classification_threshold=0.01)
    mesh = make_mesh(jax.devices()[:8], spatial=4)  # (data=2, spatial=4)
    spmd = compile_inference(det, variables, (64, 64), "fp32", preprocess=pre,
                             classification_threshold=0.01, batch_size=2,
                             mesh=mesh)
    assert spmd.spmd_mesh is mesh
    img2 = np.concatenate([img, img[:, ::-1]], axis=0)
    a0 = base(jnp.asarray(img2[:1]), vhw)
    a1 = base(jnp.asarray(img2[1:]), vhw)
    b = spmd(img2, vhw)
    for i, a in enumerate((a0, a1)):
        n = int(a["count"][0])
        assert int(b["count"][i]) == n
        np.testing.assert_allclose(np.asarray(b["boxes"][i, :n]),
                                   np.asarray(a["boxes"][0, :n]),
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(b["scores"][i, :n]),
                                   np.asarray(a["scores"][0, :n]),
                                   rtol=1e-4, atol=1e-4)
    with pytest.raises(ValueError):
        compile_inference(det, variables, (64, 64), "fp32", preprocess=pre,
                          mesh=mesh, split=True)


def test_batched_engine_predict_mixed_sizes():
    """predict_for_batch_with_engine: per-image (B, 2) valid_hw — a batch
    of differently-sized images padded into one engine bucket returns the
    same rows as predict_for_single_image_with_engine per image."""
    det, variables, _ = _engine_setup()
    pre = make_device_preprocess((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    rng = np.random.RandomState(1)
    imgs = [
        rng.randint(0, 255, (64, 64, 3)).astype(np.uint8),
        rng.randint(0, 255, (48, 57, 3)).astype(np.uint8),
        rng.randint(0, 255, (33, 64, 3)).astype(np.uint8),
    ]
    single = compile_inference(det, variables, (64, 64), "fp32",
                               preprocess=pre, classification_threshold=0.01)
    batched = compile_inference(det, variables, (64, 64), "fp32",
                                preprocess=pre, classification_threshold=0.01,
                                batch_size=3)
    rows_b = det.predict_for_batch_with_engine(batched, imgs)
    for img, rows in zip(imgs, rows_b):
        rows_s = det.predict_for_single_image_with_engine(single, img)
        assert len(rows) == len(rows_s), (len(rows), len(rows_s))
        np.testing.assert_allclose(np.asarray(rows, np.float32),
                                   np.asarray(rows_s, np.float32),
                                   rtol=1e-4, atol=1e-3)


def test_bucketed_engine_set_routes_and_matches():
    """BucketedEngineSet: images route to the smallest covering bucket,
    engines build lazily once per bucket, and rows match a directly-built
    engine at the same bucket."""
    from lfdtpu.deploy import BucketedEngineSet

    det, variables, _ = _engine_setup()
    pre = make_device_preprocess((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    bset = BucketedEngineSet(det, variables, buckets=((32, 32), (64, 64)),
                             precision="fp32", preprocess=pre,
                             classification_threshold=0.01)
    rng = np.random.RandomState(2)
    small = rng.randint(0, 255, (30, 31, 3)).astype(np.uint8)
    large = rng.randint(0, 255, (50, 64, 3)).astype(np.uint8)
    assert bset.bucket_for(30, 31) == (32, 32)
    assert bset.bucket_for(50, 64) == (64, 64)
    assert bset.bucket_for(100, 100) is None

    rows_small = bset.predict(small)
    rows_large = bset.predict(large)
    assert set(bset._engines) == {(32, 32), (64, 64)}

    direct = compile_inference(det, variables, (64, 64), "fp32",
                               preprocess=pre, classification_threshold=0.01)
    rows_ref = det.predict_for_single_image_with_engine(direct, large)
    assert len(rows_large) == len(rows_ref)
    if rows_ref:
        np.testing.assert_allclose(np.asarray(rows_large, np.float32),
                                   np.asarray(rows_ref, np.float32),
                                   rtol=1e-4, atol=1e-3)
    # routing reuses the cached engine (no rebuild)
    e1 = bset.engine_for(20, 20)
    e2 = bset.engine_for(31, 32)
    assert e1 is e2

    import pytest
    with pytest.raises(ValueError):
        bset.engine_for(100, 100)
    assert isinstance(rows_small, list)


def test_decode_knobs_preserve_results():
    """approx_topk (stage-1 approx_max_k) and nms_use_pallas=False (forced
    lax fixpoint) are latency knobs, not semantics knobs: on the same
    weights/image they must reproduce the default engine's detections.
    (approx_topk selection is approximate only among sub-threshold tail
    candidates at recall 0.99; on a tiny scene it is exact.)"""
    det, variables, img = _engine_setup()
    pre = make_device_preprocess((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    vhw = jnp.asarray([64.0, 64.0])
    base = compile_inference(det, variables, (64, 64), "fp32", preprocess=pre,
                             classification_threshold=0.01)
    d0 = base(jnp.asarray(img), vhw)
    for kw in ({"approx_topk": True}, {"nms_use_pallas": False},
               {"approx_topk": True, "nms_use_pallas": False}):
        e = compile_inference(det, variables, (64, 64), "fp32",
                              preprocess=pre, classification_threshold=0.01,
                              **kw)
        d = e(jnp.asarray(img), vhw)
        assert int(d["count"][0]) == int(d0["count"][0]), kw
        n = int(d0["count"][0])
        np.testing.assert_allclose(np.asarray(d["boxes"][0][:n]),
                                   np.asarray(d0["boxes"][0][:n]),
                                   atol=1e-5, err_msg=str(kw))


def test_packed_output_engine_matches_default():
    """pack_output=True returns ONE (B, max_det, 7) buffer whose
    unpack_detections equals the default engine's 4-buffer dict (the
    packing exists because each extra output buffer costs ~0.17 ms/call
    on the remote backend — BENCH.md int8 attribution)."""
    from lfdtpu.deploy import unpack_detections

    det, variables, img = _engine_setup()
    pre = make_device_preprocess((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    vhw = jnp.asarray([64.0, 64.0])
    base = compile_inference(det, variables, (64, 64), "fp32", preprocess=pre,
                             classification_threshold=0.01)
    packed_eng = compile_inference(det, variables, (64, 64), "fp32",
                                   preprocess=pre,
                                   classification_threshold=0.01,
                                   pack_output=True)
    d0 = base(jnp.asarray(img), vhw)
    packed = packed_eng(jnp.asarray(img), vhw)
    assert packed.shape[-1] == 7
    d = unpack_detections(packed)
    n = int(np.asarray(d0["count"])[0])
    assert int(d["count"][0]) == n
    np.testing.assert_allclose(d["boxes"][0][:n],
                               np.asarray(d0["boxes"])[0][:n], atol=1e-6)
    np.testing.assert_allclose(d["scores"][0][:n],
                               np.asarray(d0["scores"])[0][:n], atol=1e-6)
    assert (d["labels"][0][:n] == np.asarray(d0["labels"])[0][:n]).all()


def test_quantized_output_engine_rounds_within_tolerance():
    """output_dtype='f16' halves the result payload (VERDICT r4 #7): boxes
    and scores come back float16 (exact to 0.5 px below 2048), labels
    int16, count untouched; detections must match the f32 engine within
    f16 rounding. Also composes with pack_output (one f16 buffer)."""
    det, variables, img = _engine_setup()
    pre = make_device_preprocess((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    vhw = jnp.asarray([64.0, 64.0])
    base = compile_inference(det, variables, (64, 64), "fp32", preprocess=pre,
                             classification_threshold=0.01)
    q = compile_inference(det, variables, (64, 64), "fp32", preprocess=pre,
                          classification_threshold=0.01, output_dtype="f16")
    d0 = base(jnp.asarray(img), vhw)
    d = q(jnp.asarray(img), vhw)
    assert d["boxes"].dtype == jnp.float16
    assert d["scores"].dtype == jnp.float16
    assert d["labels"].dtype == jnp.int16
    n = int(np.asarray(d0["count"])[0])
    assert int(np.asarray(d["count"])[0]) == n
    np.testing.assert_allclose(np.asarray(d["boxes"], np.float32)[0][:n],
                               np.asarray(d0["boxes"])[0][:n], atol=0.5)
    np.testing.assert_allclose(np.asarray(d["scores"], np.float32)[0][:n],
                               np.asarray(d0["scores"])[0][:n], atol=2e-3)
    assert (np.asarray(d["labels"])[0][:n]
            == np.asarray(d0["labels"])[0][:n]).all()

    qp = compile_inference(det, variables, (64, 64), "fp32", preprocess=pre,
                           classification_threshold=0.01, output_dtype="f16",
                           pack_output=True)
    packed = qp(jnp.asarray(img), vhw)
    assert packed.dtype == jnp.float16 and packed.shape[-1] == 7


def test_decode_budget_override_engine_matches_default():
    """pre_nms_points/nms_budget engine overrides shrink the decode's
    selection stages; with budgets still covering every real candidate the
    detections must match the default engine exactly."""
    det, variables, img = _engine_setup()
    pre = make_device_preprocess((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    vhw = jnp.asarray([64.0, 64.0])
    base = compile_inference(det, variables, (64, 64), "fp32", preprocess=pre,
                             classification_threshold=0.01)
    small = compile_inference(det, variables, (64, 64), "fp32",
                              preprocess=pre, classification_threshold=0.01,
                              pre_nms_points=64, nms_budget=64)
    d0 = base(jnp.asarray(img), vhw)
    d = small(jnp.asarray(img), vhw)
    n = int(np.asarray(d0["count"])[0])
    assert int(np.asarray(d["count"])[0]) == n
    np.testing.assert_allclose(np.asarray(d["boxes"])[0][:n],
                               np.asarray(d0["boxes"])[0][:n], atol=1e-5)
    np.testing.assert_allclose(np.asarray(d["scores"])[0][:n],
                               np.asarray(d0["scores"])[0][:n], atol=1e-6)
