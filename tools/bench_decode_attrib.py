#!/usr/bin/env python
"""DCE-prefix attribution INSIDE the fused decode (round 4).

The int8 engine attribution (tools/bench_int8_attrib.py) measured decode
+ NMS at +1.58 ms — the second-largest component after the backbone —
while the approx_topk engine variant measured latency-neutral, so the
cost is NOT the stage-1 full sort alone. This tool truncates INSIDE
`ops/decode.decode_predictions`'s pipeline to attribute it:

    net    = head outputs (== bench_int8_attrib 'net')
    probs  = + sigmoid + point_valid mask + per-point max over classes
    top1   = + stage-1 top_k(P -> pre_nms_points) + candidate gathers
    cand   = + stage-2 (point,class) top_k + distance decode + box clamp
    nms    = + batched class-offset NMS keep mask
    full   = the complete engine (== headline cell)

The stage bodies restate decode_predictions' steps 1:1 (same ops, same
budgets) — the deltas attribute the real engine because stage N's
program is stage N-1's program plus exactly one pipeline step, and the
reconstruction is validated against the shipped decode by
tests/test_deploy.py::test_decode_knobs_preserve_results-style parity in
the 'nms' stage (keep mask consumed, not recomputed).

Usage: python tools/bench_decode_attrib.py WIDERFACE-L 1080 1920 STAGE [loops]
STAGE in {probs, top1, cand, nms}.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

STAGES = ("probs", "top1", "cand", "nms", "out")


def main():
    t0 = time.time()
    model_name = sys.argv[1]
    h, w = int(sys.argv[2]), int(sys.argv[3])
    stage = sys.argv[4]
    loops = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    assert stage in STAGES, stage

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench_cell import build_cell
    from lfdtpu.deploy import timing_inference
    from lfdtpu.deploy.int8_net import int8_fused_apply
    from lfdtpu.ops.decode import _decode_distances
    from lfdtpu.ops.nms import batched_nms_jax

    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "calibrate_cell.py"),
         model_name, str(h), str(w)],
        capture_output=True, text=True, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("AMAX ")][-1]
    amax = json.loads(line[len("AMAX "):])

    det, variables, preprocess = build_cell(model_name)
    divisor = max(det.point_strides)
    ph = (h + divisor - 1) // divisor * divisor
    pw = (w + divisor - 1) // divisor * divisor
    spec = det.decode_spec()
    info = jax.device_put(
        {k: jnp.asarray(v) for k, v in det.level_arrays((ph, pw)).items()}
    )
    run_vars = jax.device_put(variables)

    def prefix(run_vars, info, images):
        x = preprocess(images).astype(jnp.float32)
        cls_o, reg_o = int8_fused_apply(det.net, run_vars, x, amax)
        cls_o = cls_o.astype(jnp.float32)[0]
        reg_o = reg_o.astype(jnp.float32)[0]
        points, ranges = info["points"], info["ranges"]
        point_valid = (points[:, 0] < jnp.float32(w)) & (
            points[:, 1] < jnp.float32(h))

        # decode_predictions steps, truncated at `stage`
        probs = jax.nn.sigmoid(cls_o)
        probs = jnp.where(point_valid[:, None], probs, 0.0)
        point_max = jnp.max(probs, axis=-1)
        vals = [point_max]
        if stage != "probs":
            P, C = probs.shape
            kp = min(spec.pre_nms_points, P)
            _, top_idx = jax.lax.top_k(point_max, kp)
            sel_probs = probs[top_idx]
            sel_reg = reg_o[top_idx]
            sel_points = points[top_idx]
            sel_ranges = ranges[top_idx]
            vals = [sel_probs, sel_reg, sel_points, sel_ranges]
        if stage in ("cand", "nms", "out"):
            flat_scores = sel_probs.reshape(-1)
            flat_valid = flat_scores > spec.score_thr
            kb = min(spec.nms_budget, kp * C)
            cand_scores, cand_flat = jax.lax.top_k(
                jnp.where(flat_valid, flat_scores, -1.0), kb)
            cand_point = cand_flat // C
            cand_label = (cand_flat % C).astype(jnp.int32)
            cand_valid = cand_scores > spec.score_thr
            dist = _decode_distances(sel_reg[cand_point],
                                     sel_points[cand_point],
                                     sel_ranges[cand_point], spec.reg_mode)
            px = sel_points[cand_point]
            x1 = jnp.clip(px[:, 0] - dist[:, 0], 0, w)
            y1 = jnp.clip(px[:, 1] - dist[:, 1], 0, h)
            x2 = jnp.clip(px[:, 0] + dist[:, 2], 0, w)
            y2 = jnp.clip(px[:, 1] + dist[:, 3], 0, h)
            boxes = jnp.stack([x1, y1, x2, y2], axis=-1)
            vals = [boxes, cand_scores, cand_label]
        if stage in ("nms", "out"):
            keep = batched_nms_jax(boxes, cand_scores, cand_label,
                                   spec.nms_iou, valid=cand_valid,
                                   class_agnostic=spec.class_agnostic)
            vals = [keep, boxes, cand_scores]
        if stage == "out":
            # the COMPLETE output assembly (same ops as decode_predictions'
            # tail), but returned as one scalar reduction instead of 4 real
            # output arrays — separates assembly COMPUTE from per-call
            # output materialization overhead (the int8-topkorder cell
            # measured the argsort->top_k swap latency-neutral, so the
            # +0.7 ms final delta needs this split)
            neg_inf = jnp.asarray(-jnp.inf, cand_scores.dtype)
            masked = jnp.where(keep, cand_scores, neg_inf)
            md = spec.max_det
            _, out_idx = jax.lax.top_k(masked, min(md, masked.shape[0]))
            out_keep = keep[out_idx]
            zero = jnp.zeros((out_idx.shape[0],), boxes.dtype)
            vals = [jnp.where(out_keep[:, None], boxes[out_idx], 0.0),
                    jnp.where(out_keep, cand_scores[out_idx], zero),
                    jnp.where(out_keep, cand_label[out_idx], 0),
                    jnp.sum(out_keep.astype(jnp.int32))]

        acc = jnp.float32(0.0)
        for v in vals:
            acc = acc + jnp.sum(v.astype(jnp.float32)) * 1e-30
        return {"count": acc}

    jitted = jax.jit(prefix)

    class _Eng:
        def __call__(self, images, valid_hw):
            return jitted(run_vars, info, images)

    images = np.random.randint(0, 255, (1, ph, pw, 3), dtype=np.uint8)
    t_build = time.time()
    r = timing_inference(_Eng(), images, (h, w), warmup_loops=12,
                         timing_loops=loops if loops else None)
    r.update(model=model_name, precision="int8", stage=f"decode:{stage}",
             height=h, width=w, build_s=round(t_build - t0, 1),
             timing_s=round(time.time() - t_build, 1))
    print("ATTRIB_RESULT " + json.dumps(r))


if __name__ == "__main__":
    main()
