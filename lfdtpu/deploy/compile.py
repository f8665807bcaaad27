# Deployment compilation (the TensorRT-path equivalent,
# `lfd/deployment/tensorrt/build_engine.py:22-152`).
#
# On TPU there is no ONNX/engine step: "building an engine" = jitting an
# end-to-end function (device preprocess -> conv net -> fused decode -> NMS)
# at a fixed input resolution and precision:
#   fp32 -> f32 jit            (reference TRT fp32 engine)
#   bf16 -> bf16 weights+math  (reference TRT fp16 engine)
#   int8 -> calibrated int8    (reference TRT int8 engine, see quantize.py)
# The compiled callable takes a raw uint8 HWC frame (padded to the
# resolution bucket) and returns fixed-shape detections — including the
# decode+NMS the reference leaves out of its engines (`lfd.py:722-800`).

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def cast_variables(variables, dtype):
    """Cast floating-point leaves (params + batch_stats) to `dtype`."""

    def cast(x):
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
            return jnp.asarray(x, dtype)
        return x

    return jax.tree.map(cast, variables)


def make_device_preprocess(mean, std, max_pixel_value=255.0, bgr2rgb=False):
    """Device-side normalization matching the host Normalize transform
    (`augmentation_pipeline.py:14-36`): runs inside the jitted engine so the
    host ships raw uint8 frames (BASELINE.json device-side preprocessing)."""
    mean = np.asarray(mean, np.float32) * max_pixel_value
    std = np.asarray(std, np.float32) * max_pixel_value

    def preprocess(image):
        x = image.astype(jnp.float32)
        if bgr2rgb:
            x = x[..., ::-1]
        return (x - mean) / std

    # exposed so compile_inference(pallas_stem=True) can fold the
    # normalization into the fused stem kernel instead of running it
    preprocess.mean = mean
    preprocess.std = std
    preprocess.bgr2rgb = bgr2rgb
    return preprocess


def _pack_detections(out):
    """Fuse the decode dict into ONE (B, max_det, 7) output array
    [x1, y1, x2, y2, score, label, valid]. Host side: `unpack_detections`.

    Why it exists / what it measured (campaign_r4): the attrib-decode
    cells showed the engine's last ~0.65 ms appears only when the real
    multi-buffer output is materialized (decode:out 5.76 ms vs full
    engine 6.40 ms), so one packed buffer was tried as a fix. MEASURED
    RESULT: latency-neutral — int8-packed 6.51 vs 6.40 unpacked,
    bf16-packed 6.68 vs 6.79 (both within run-to-run spread). The cost
    is the output materialization itself (HBM write + transfer window),
    not the number of buffers. Kept default-off as a host-convenience
    knob (one D2H fetch instead of four), not a latency recommendation."""
    boxes, scores = out["boxes"], out["scores"]
    labels, count = out["labels"], out["count"]
    md = boxes.shape[-2]
    valid = (jnp.arange(md) < count[..., None]).astype(boxes.dtype)
    return jnp.concatenate(
        [boxes, scores[..., None], labels[..., None].astype(boxes.dtype),
         valid[..., None]], axis=-1)


def unpack_detections(packed):
    """Host-side inverse of the pack_output engine mode: (..., max_det, 7)
    -> the standard decode dict (numpy): boxes (..., max_det, 4),
    scores, labels (int32), count (int32). One D2H fetch of the single
    packed buffer replaces four."""
    import numpy as np

    a = np.asarray(packed)
    return dict(
        boxes=a[..., :4],
        scores=a[..., 4],
        labels=a[..., 5].astype(np.int32),
        count=a[..., 6].astype(np.int32).sum(axis=-1),
    )


def compile_inference(
    detector,
    variables,
    input_hw,
    precision="fp32",
    preprocess=None,
    classification_threshold=None,
    nms_threshold=None,
    class_agnostic=False,
    max_det=None,
    batch_size=1,
    act_scales=None,
    approx_topk=False,
    nms_use_pallas=None,
    pallas_convs="auto",
    pallas_stem=False,
    s2d_stem=False,
    split=False,
    mesh=None,
    int8_head_dtype=None,
    pack_output=False,
    output_dtype=None,
    pre_nms_points=None,
    nms_budget=None,
):
    """Build ("compile") one inference engine.

    Returns a jitted fn(images (B, H, W, C) uint8/float, valid_hw f32)
    -> decoded dict with fixed-shape boxes/scores/labels/count per image.
    valid_hw is (2,) when every image shares one valid extent, or (B, 2)
    with per-image extents for mixed-size batched serving (each image
    zero-padded into the same engine bucket).
    Call `.lower(...).compile()` happens on first invocation; use
    latency.timing_inference for warmup-excluded measurement.

    approx_topk: use the TPU-native approx_max_k for the pre-NMS candidate
    selection (see DecodeSpec.approx_topk). Measured on the v5e tunnel it
    is latency-neutral for these P sizes (7.06 vs 7.04 ms at 1080p-L), so
    the default stays False (exact, bit-identical to the predict path).

    pallas_convs: route eligible backbone convs (3x3 s1 64->64) through the
    hand-written pair-im2col Pallas kernel (~3.7x the XLA conv throughput
    at these shapes; ops/conv_pallas.py). "auto" currently resolves to
    OFF: isolated kernel swaps lose end-to-end to XLA<->Pallas relayout
    costs (BENCH.md); pass True (ideally with split=True) to opt in.

    pallas_stem: run normalize + stem0 (3x3/s2 conv 3->64) + folded BN +
    ReLU as ONE Pallas kernel consuming the raw uint8 frame (the XLA stem
    conv runs at <2 TFLOP/s — BENCH.md attribution). bf16 engines only;
    requires a preprocess from make_device_preprocess (its mean/std fold
    into the kernel) and a 'fast'/'faster'-stem LFD backbone.
    NOTE: current Mosaic cannot lower the kernel's tap-gather shape cast
    (see ops/conv_pallas.py header for the named failing layouts), so on
    real TPU this option fails at compile; it works in interpret mode and
    is kept for future Mosaic releases.

    s2d_stem: restate stem0 as a space-to-depth 2x2/s1 conv with the
    device normalize + BN folded in (pure XLA; exact, incl. padding
    corrections — deploy/s2d_net.py). The engine consumes raw uint8
    frames; requires a make_device_preprocess preprocess and a
    ConvNormAct(3x3/s2, BN, ReLU) stem0. fp32/bf16 engines.

    split: build a TWO-PROGRAM engine — program 1 = preprocess + backbone
    stem, program 2 = body + neck + head + decode + NMS, chained device-to-
    device. At a program boundary XLA propagates the default-layout
    requirement back through the convs, so Pallas<->XLA junction relayouts
    (the reason pallas_convs defaults off; BENCH.md) become free, at the
    cost of one extra per-program dispatch (~1 ms on the tunnel backend).

    int8_head_dtype: "bf16" runs the int8 engine's FLOAT remainder (the
    GroupNorm head and any other int8-ineligible module) in bfloat16
    instead of f32 — weights cast at build, the backbone's dequant handoff
    emits bf16, requant epilogues stay f32. Halves the head's HBM traffic;
    scores shift within bf16 rounding (decode casts to f32 either way).

    mesh: a `jax.sharding.Mesh` (from `lfdtpu.parallel.make_mesh`) to run
    the ONE engine program SPMD over multiple chips — the multi-chip
    inference mode the reference has no analogue of. With a `spatial`
    axis, the image HEIGHT is sharded across it and GSPMD inserts the
    conv halo exchanges over ICI (for 4K/8K frames that exceed one chip
    or to cut latency); the `data` axis shards the batch. Weights and
    point grids replicate; the decoded output is replicated. Exclusive
    with `split` (one program) and not serializable via engine_io.
    """
    import dataclasses

    input_hw = (int(input_hw[0]), int(input_hw[1]))
    spec = detector.decode_spec(
        classification_threshold, nms_threshold, class_agnostic, max_det
    )
    if approx_topk:
        spec = dataclasses.replace(spec, approx_topk=True)
    if nms_use_pallas is not None:
        spec = dataclasses.replace(spec, nms_use_pallas=nms_use_pallas)
    # decode-budget overrides (serving knob): the detector defaults both
    # to its pre_nms_bbox_limit (reference semantics, 1000). Smaller
    # budgets shrink the decode's top-k / gather / NMS stages — useful at
    # small resolutions or many-class heads where the candidate stages
    # are a visible fraction of the engine (BENCH.md attribution).
    if pre_nms_points is not None:
        spec = dataclasses.replace(spec, pre_nms_points=int(pre_nms_points))
    if nms_budget is not None:
        spec = dataclasses.replace(spec, nms_budget=int(nms_budget))

    # output_dtype: "f16" emits boxes/scores as float16 and labels as
    # int16 (count stays int32) — half the result-buffer payload for the
    # serving D2H window. None/f32 = full precision (default).
    out_dtype = None
    if output_dtype is not None:
        named = {"f16": jnp.float16, "float16": jnp.float16,
                 "bf16": jnp.bfloat16, "f32": jnp.float32}
        out_dtype = jnp.dtype(named.get(output_dtype, output_dtype)
                              if isinstance(output_dtype, str)
                              else output_dtype)
        if out_dtype == jnp.dtype(jnp.float32):
            out_dtype = None

    if precision == "fp32":
        run_vars = variables
        compute_dtype = jnp.float32
    elif precision == "bf16":
        run_vars = cast_variables(variables, jnp.bfloat16)
        compute_dtype = jnp.bfloat16
    elif precision == "int8":
        # FUSED int8 chain (int8_net.int8_fused_apply): activations stay
        # int8 across the backbone, one requant epilogue per conv, folded
        # BN, static calibrated scales. Weights ship f32 and quantize at
        # trace time (a few tiny per-call elementwise passes) — NOT
        # prequantized: the head runs unintercepted in float, and int8
        # kernels there would be read as raw quantized integers.
        from .int8_net import calibrate_module_amax

        if act_scales is None:
            # placeholder calibration on noise frames (TRT-style real-crop
            # calibration: pass calibrate_module_amax(...) as act_scales).
            # NOTE for benchmarking: this fetches a calibration program's
            # output, which degrades THIS process's per-call latency on the
            # remote backend — precalibrate in a separate process and pass
            # the dict when timing engines.
            rng_ = np.random.RandomState(0)
            frames = [
                rng_.randint(0, 255, (batch_size,) + input_hw + (3,), dtype=np.uint8)
                for _ in range(2)
            ]
            act_scales = calibrate_module_amax(
                detector, variables, frames, preprocess=preprocess
            )
        if int8_head_dtype == "bf16":
            # float remainder (head) runs bf16: cast weights once at build;
            # the int8 backbone quantizes kernels from the bf16 values
            # (sub-1e-2 extra rounding on the w_scales)
            run_vars = cast_variables(variables, jnp.bfloat16)
        else:
            run_vars = variables
        compute_dtype = jnp.float32
    else:
        raise ValueError(f"unknown precision {precision}")
    weight_scales = None

    if mesh is not None and mesh.size > 1:
        if split:
            raise ValueError("mesh engines are one SPMD program; use split=False")
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as _P

        from ..parallel.mesh import DATA_AXIS, SPATIAL_AXIS

        _rep = NamedSharding(mesh, _P())
        if SPATIAL_AXIS in mesh.axis_names:
            # batch over `data` (if present), image HEIGHT over `spatial`:
            # GSPMD emits the stride/halo exchanges for every conv
            _bx = DATA_AXIS if DATA_AXIS in mesh.axis_names else None
            _img_sharding = NamedSharding(mesh, _P(_bx, SPATIAL_AXIS))
        else:
            _img_sharding = NamedSharding(mesh, _P(DATA_AXIS))
        _put = lambda v: jax.device_put(v, _rep)
    else:
        mesh = None
        _put = jax.device_put

    # weights and point-grid constants are jit ARGUMENTS held on device by
    # the Engine wrapper: closing over them would embed them as compiled-in
    # constants that this backend re-uploads on every call (~30 ms/call for
    # a 1.2M-param model — measured). Under a mesh they replicate.
    run_vars = _put(run_vars)
    level_arrays = {
        k: _put(v)
        for k, v in detector.level_arrays(input_hw).items()
    }
    if weight_scales is not None:
        weight_scales = {k: _put(v) for k, v in weight_scales.items()}

    if pallas_convs == "auto":
        # Default OFF for now: the pair kernel alone is 3.7x the XLA conv,
        # but measured end-to-end each XLA<->pallas region boundary costs
        # 0.4-0.9 ms in relayouts at 272x480 activations — isolated kernel
        # swaps lose (11.8 vs 6.9 ms at 1080p-L). The win requires the
        # contiguous pallas backbone region (see pallas_net.py docstring).
        pallas_convs = False
    weight_packs = None
    if pallas_convs:
        from .pallas_net import prepack_pair_weights

        weight_packs = {
            k: _put(v)
            for k, v in prepack_pair_weights(run_vars).items()
        }
        if not weight_packs:
            weight_packs = None

    stem_pack = None
    if pallas_stem:
        from .pallas_net import prepack_stem

        if precision != "bf16":
            raise ValueError("pallas_stem requires precision='bf16'")
        if preprocess is None or not hasattr(preprocess, "mean"):
            raise ValueError(
                "pallas_stem needs a make_device_preprocess preprocess "
                "(its mean/std fold into the stem kernel)"
            )
        stem_pack = prepack_stem(
            run_vars, preprocess.mean, preprocess.std,
            bgr2rgb=preprocess.bgr2rgb,
        )
        if stem_pack is None:
            raise ValueError(
                "pallas_stem: the backbone's stem0 is not a "
                "ConvNormAct(64, k3, s2, BatchNorm) on a 3-channel input"
            )
        stem_pack = tuple(_put(v) for v in stem_pack)
    s2d_pack = None
    if s2d_stem:
        from .s2d_net import prepack_s2d_stem

        if pallas_stem:
            raise ValueError("s2d_stem and pallas_stem are exclusive")
        if precision not in ("fp32", "bf16", "int8"):
            raise ValueError("s2d_stem requires precision fp32/bf16/int8")
        if preprocess is None or not hasattr(preprocess, "mean"):
            raise ValueError(
                "s2d_stem needs a make_device_preprocess preprocess "
                "(its mean/std fold into the stem conv)"
            )
        if input_hw[0] % 2 or input_hw[1] % 2:
            raise ValueError("s2d_stem needs even input height/width")
        # fold from the ORIGINAL f32 variables for full folding precision
        s2d_pack = prepack_s2d_stem(
            variables, preprocess.mean, preprocess.std,
            bgr2rgb=preprocess.bgr2rgb, compute_dtype=compute_dtype,
        )
        if s2d_pack is None:
            raise ValueError(
                "s2d_stem: the backbone's stem0 is not a "
                "ConvNormAct(3x3/s2, BatchNorm) on a 3-channel input"
            )
        s2d_pack = tuple(_put(v) for v in s2d_pack)
    if split and precision == "int8":
        raise ValueError("split engines do not support int8")
    if split and not hasattr(detector.net.backbone, "stem_forward"):
        raise ValueError(
            "split engines need a backbone with stem_forward/body_forward "
            "(LFDResNet); %s has no such split point"
            % type(detector.net.backbone).__name__
        )

    import contextlib

    def _front(x, stem_pack, s2d_pack):
        """Raw frames -> preprocessed net input (or unchanged raw uint8
        when a stem interception consumes the raw frame itself)."""
        if stem_pack is not None or s2d_pack is not None:
            return x  # raw uint8: normalization folds into the stem
        if preprocess is not None:
            x = preprocess(x)
        return x.astype(compute_dtype)

    def _net_ctx(weight_packs, stem_pack, s2d_pack):
        stack = contextlib.ExitStack()
        if weight_packs is not None:
            from .pallas_net import pallas_conv_interception

            stack.enter_context(pallas_conv_interception(weight_packs))
        if stem_pack is not None:
            from .pallas_net import pallas_stem_interception

            stack.enter_context(pallas_stem_interception(stem_pack))
        if s2d_pack is not None:
            from .s2d_net import s2d_stem_interception

            stack.enter_context(s2d_stem_interception(s2d_pack))
        return stack

    def _decode(cls_o, reg_o, level_arrays, valid_hw):
        cls_o = cls_o.astype(jnp.float32)
        reg_o = reg_o.astype(jnp.float32)
        if valid_hw.ndim == 2:
            # per-image valid extents (B, 2): mixed-size batched serving,
            # each image padded into the same engine bucket
            decode = lambda c, r, v: detector.decode_single(
                (c, r), input_hw, (v[0], v[1]), spec,
                level_arrays=level_arrays,
            )
            return jax.vmap(decode, in_axes=(0, 0, 0))(cls_o, reg_o, valid_hw)
        decode = lambda c, r: detector.decode_single(
            (c, r), input_hw, (valid_hw[0], valid_hw[1]), spec,
            level_arrays=level_arrays,
        )
        return jax.vmap(decode)(cls_o, reg_o)

    def _engine_impl(run_vars, level_arrays, weight_scales, weight_packs,
                     stem_pack, s2d_pack, images, valid_hw):
        x = _front(images, stem_pack, s2d_pack)
        if precision == "int8":
            from .int8_net import int8_fused_apply

            # s2d composition: raw frames pass through, stem0 runs as the
            # s2d folded conv (inner interception), the chain statically
            # quantizes from the first block's own calibrated input amax
            with _net_ctx(None, None, s2d_pack):
                cls_o, reg_o = int8_fused_apply(
                    detector.net, run_vars, x, act_scales,
                    weight_scales=weight_scales,
                    quantize_input=s2d_pack is None,
                    skip_stem0=s2d_pack is not None,
                    dequant_dtype=(jnp.bfloat16 if int8_head_dtype == "bf16"
                                   else jnp.float32),
                )
        else:
            with _net_ctx(weight_packs, stem_pack, s2d_pack):
                cls_o, reg_o = detector.net.apply(run_vars, x, train=False)
        out = _decode(cls_o, reg_o, level_arrays, valid_hw)
        if pack_output:
            out = _pack_detections(out)
        if out_dtype is not None:
            # quantized outputs (VERDICT r4 #7): halve the result payload
            # (the int8 attribution pins ~0.7 ms on materializing/fetching
            # the output buffers). f16 boxes are exact to 0.5 px at 1080p
            # (1 px at 4K); scores round within 1e-3; labels fit int16.
            if pack_output:
                out = out.astype(out_dtype)
            else:
                out = dict(
                    boxes=out["boxes"].astype(out_dtype),
                    scores=out["scores"].astype(out_dtype),
                    labels=out["labels"].astype(jnp.int16),
                    count=out["count"],
                )
        return out

    if mesh is None:
        _engine = jax.jit(_engine_impl)
    else:
        # SPMD engine: consts replicated, images sharded (batch over
        # `data`, height over `spatial`), decoded results replicated.
        # GSPMD inserts the conv halo exchanges / gathers over ICI.
        _engine = jax.jit(
            _engine_impl,
            in_shardings=(_rep,) * 6 + (_img_sharding, _rep),
            out_shardings=_rep,
        )

    @jax.jit
    def _stem_prog(run_vars, stem_pack, s2d_pack, images):
        x = _front(images, stem_pack, s2d_pack)
        with _net_ctx(None, stem_pack, s2d_pack):
            return detector.net.apply(
                run_vars, x, train=False,
                method=lambda net, x, train: net.backbone.stem_forward(x, train),
            )

    @jax.jit
    def _body_prog(run_vars, level_arrays, weight_packs, x, valid_hw):
        with _net_ctx(weight_packs, None, None):
            cls_o, reg_o = detector.net.apply(
                run_vars, x, train=False, method="from_stem"
            )
        return _decode(cls_o, reg_o, level_arrays, valid_hw)

    class Engine:
        """Compiled engine: __call__(images, valid_hw) -> decoded dict."""

        precision_mode = precision
        input_resolution = input_hw
        is_split = bool(split)
        spmd_mesh = mesh

        def __call__(self, images, valid_hw):
            vhw = jnp.asarray(valid_hw, jnp.float32)
            if split:
                h = _stem_prog(run_vars, stem_pack, s2d_pack, images)
                return _body_prog(run_vars, level_arrays, weight_packs,
                                  h, vhw)
            return _engine(run_vars, level_arrays, weight_scales,
                           weight_packs, stem_pack, s2d_pack, images, vhw)

        def export_parts(self):
            """(jitted fn, constant args) for engine_io.save_engine —
            constants are the leading positional args of the program."""
            if split:
                raise ValueError(
                    "split engines are two programs; serialize with "
                    "split=False (same math, one program)"
                )
            if mesh is not None:
                raise ValueError(
                    "mesh (SPMD) engines are topology-bound; serialize "
                    "with mesh=None and pass mesh at load-site rebuild"
                )
            return _engine, (run_vars, level_arrays, weight_scales,
                             weight_packs, stem_pack, s2d_pack)

        def example_args(self):
            # batch engines serialize with per-image (B, 2) valid extents
            # (the batched-serving shape); loaded engines broadcast a (2,)
            # valid_hw up to it (engine_io.LoadedEngine)
            h, w = input_hw
            vhw_shape = (batch_size, 2) if batch_size > 1 else (2,)
            return (
                np.zeros((batch_size, h, w, 3), np.uint8),
                np.zeros(vhw_shape, np.float32),
            )

    return Engine()
