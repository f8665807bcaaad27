# Parity: the static-shape fused decode (top-k + mask + fixed-size NMS)
# must produce the same boxes as the reference's dynamic-shape decode
# (threshold filter -> class-offset NMS, `lfd/model/lfd.py:577-641`),
# mirrored here in numpy on the same dense outputs.
import numpy as np
import jax.numpy as jnp

from lfdtpu.ops.decode import DecodeSpec, decode_predictions
from lfdtpu.ops.points import concat_level_info, compute_gray_ranges
import lfdtpu.ops.nms  # noqa: F401
import sys

N = sys.modules["lfdtpu.ops.nms"]


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def reference_decode_mirror(cls_logits, reg, points, ranges, score_thr, iou_thr,
                            image_hw, mode="sigmoid"):
    """Numpy transcription of the reference decode semantics."""
    probs = _sigmoid(cls_logits)  # (P, C)
    P, C = probs.shape
    h, w = image_hw
    if mode == "exp":
        dist = np.exp(reg)
    elif mode == "sigmoid":
        dist = _sigmoid(reg) * ranges.max(-1, keepdims=True)
    else:
        raise ValueError(mode)
    x1 = np.clip(points[:, 0] - dist[:, 0], 0, w)
    y1 = np.clip(points[:, 1] - dist[:, 1], 0, h)
    x2 = np.clip(points[:, 0] + dist[:, 2], 0, w)
    y2 = np.clip(points[:, 1] + dist[:, 3], 0, h)
    boxes = np.stack([x1, y1, x2, y2], -1)

    # flatten (point, class) pairs, threshold (multiclass_nms semantics)
    flat_boxes = np.repeat(boxes, C, axis=0)
    flat_scores = probs.reshape(-1)
    flat_labels = np.tile(np.arange(C), P)
    valid = flat_scores > score_thr
    fb, fs, fl = flat_boxes[valid], flat_scores[valid], flat_labels[valid]
    if len(fs) == 0:
        return np.zeros((0, 6))
    # class-offset NMS
    max_coord = fb.max()
    off = fl[:, None] * (max_coord + 1)
    dets = np.concatenate([fb + off, fs[:, None]], -1).astype(np.float32)
    _, keep = N.nms(dets, iou_thr)
    rows = []
    for i in keep:
        rows.append([fl[i], fs[i], *fb[i]])
    rows.sort(key=lambda r: -r[1])
    return np.asarray(rows)


def test_decode_matches_reference_mirror(rng):
    info = concat_level_info([(8, 8), (4, 4)], [8, 16], [(0, 32), (32, 64)],
                             compute_gray_ranges([(0, 32), (32, 64)], (0.9, 1.1)))
    P = info["points"].shape[0]
    C = 3
    for trial in range(5):
        cls_logits = rng.randn(P, C).astype(np.float32) * 2 - 2
        reg = rng.randn(P, 4).astype(np.float32)
        spec = DecodeSpec(num_classes=C, reg_mode="sigmoid", score_thr=0.3,
                          nms_iou=0.5, pre_nms_points=P, nms_budget=P * C,
                          max_det=P * C)
        out = decode_predictions(
            jnp.asarray(cls_logits), jnp.asarray(reg),
            jnp.asarray(info["points"]), jnp.asarray(info["ranges"]),
            spec, (64.0, 64.0),
        )
        count = int(out["count"])
        got = np.concatenate(
            [
                np.asarray(out["labels"][:count])[:, None],
                np.asarray(out["scores"][:count])[:, None],
                np.asarray(out["boxes"][:count]),
            ],
            axis=1,
        )
        ref = reference_decode_mirror(
            cls_logits, reg, info["points"], info["ranges"], 0.3, 0.5, (64, 64)
        )
        assert len(ref) == count, (len(ref), count)
        # same (label, score) multiset, same boxes (sorted by score)
        order_ref = np.argsort(-ref[:, 1], kind="stable")
        ref = ref[order_ref]
        np.testing.assert_allclose(got[:, 1], ref[:, 1], rtol=1e-5)
        np.testing.assert_array_equal(got[:, 0], ref[:, 0])
        np.testing.assert_allclose(got[:, 2:], ref[:, 2:], rtol=1e-4, atol=1e-3)


def test_softmax_decode_matches_dense_mirror(rng):
    """CE-loss heads (TT100K) decode through softmax over C+1 columns.
    decode_predictions ranks stage-1 points WITHOUT materializing the
    (P, C) prob array (exp(max_fg - m)/z per point); this must equal the
    dense softmax-then-max formulation the reference uses exactly."""
    info = concat_level_info([(8, 8), (4, 4)], [8, 16], [(0, 32), (32, 64)])
    P = info["points"].shape[0]
    C = 5
    for trial in range(5):
        cls_logits = rng.randn(P, C + 1).astype(np.float32) * 3 - 1
        reg = rng.randn(P, 4).astype(np.float32)

        # dense mirror: full softmax, drop bg, flatten/threshold/NMS
        e = np.exp(cls_logits - cls_logits.max(-1, keepdims=True))
        probs = (e / e.sum(-1, keepdims=True))[:, :C]
        # push the dense probs through the sigmoid mirror by inverting:
        # logit(p) so reference_decode_mirror's sigmoid recovers p exactly
        # is numerically lossy — instead inline the same tail here.
        dist = _sigmoid(reg) * info["ranges"].max(-1, keepdims=True)
        x1 = np.clip(info["points"][:, 0] - dist[:, 0], 0, 64)
        y1 = np.clip(info["points"][:, 1] - dist[:, 1], 0, 64)
        x2 = np.clip(info["points"][:, 0] + dist[:, 2], 0, 64)
        y2 = np.clip(info["points"][:, 1] + dist[:, 3], 0, 64)
        boxes = np.stack([x1, y1, x2, y2], -1)
        flat_boxes = np.repeat(boxes, C, axis=0)
        flat_scores = probs.reshape(-1)
        flat_labels = np.tile(np.arange(C), P)
        valid = flat_scores > 0.3
        fb, fs, fl = flat_boxes[valid], flat_scores[valid], flat_labels[valid]
        if len(fs):
            off = fl[:, None] * (fb.max() + 1)
            dets = np.concatenate([fb + off, fs[:, None]], -1).astype(np.float32)
            _, keep = N.nms(dets, 0.5)
            ref = np.asarray(sorted(
                ([fl[i], fs[i], *fb[i]] for i in keep), key=lambda r: -r[1]))
        else:
            ref = np.zeros((0, 6))

        spec = DecodeSpec(num_classes=C, use_softmax=True, reg_mode="sigmoid",
                          score_thr=0.3, nms_iou=0.5, pre_nms_points=P,
                          nms_budget=P * C, max_det=P * C)
        out = decode_predictions(
            jnp.asarray(cls_logits), jnp.asarray(reg),
            jnp.asarray(info["points"]), jnp.asarray(info["ranges"]),
            spec, (64.0, 64.0),
        )
        count = int(out["count"])
        assert len(ref) == count, (len(ref), count)
        if count:
            got = np.concatenate(
                [np.asarray(out["labels"][:count])[:, None],
                 np.asarray(out["scores"][:count])[:, None],
                 np.asarray(out["boxes"][:count])], axis=1)
            np.testing.assert_allclose(got[:, 1], ref[:, 1], rtol=1e-5)
            np.testing.assert_array_equal(got[:, 0], ref[:, 0])
            np.testing.assert_allclose(got[:, 2:], ref[:, 2:], rtol=1e-4,
                                       atol=1e-3)


def test_stage1_scoring_with_factors_and_mask(rng):
    """point_max is computed from logits (max-then-activate); with
    score_factors and point_valid it must equal the dense
    activate-then-max formulation bitwise."""
    import jax

    P, C = 64, 7
    logits = jnp.asarray(rng.randn(P, C).astype(np.float32) * 2)
    factors = jax.nn.sigmoid(jnp.asarray(rng.randn(P).astype(np.float32)))
    valid = jnp.asarray(rng.rand(P) > 0.3)

    dense = jnp.max(jax.nn.sigmoid(logits) * factors[:, None], axis=-1)
    dense = jnp.where(valid, dense, 0.0)
    fused = jax.nn.sigmoid(jnp.max(logits, axis=-1)) * factors
    fused = jnp.where(valid, fused, 0.0)
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(fused))

    # softmax path: exp(max_fg - m)/z == max over softmax[:, :C]
    logits_bg = jnp.asarray(rng.randn(P, C + 1).astype(np.float32) * 2)
    dense_sm = jnp.max(jax.nn.softmax(logits_bg, axis=-1)[:, :C], axis=-1)
    m = jnp.max(logits_bg, axis=-1)
    z = jnp.sum(jnp.exp(logits_bg - m[:, None]), axis=-1)
    fused_sm = jnp.exp(jnp.max(logits_bg[:, :C], axis=-1) - m) / z
    np.testing.assert_array_equal(np.asarray(dense_sm), np.asarray(fused_sm))


def test_per_level_topk_matches_reference_mirror(rng):
    """LFDv2's pre-NMS limit is applied PER LEVEL before concat
    (`lfd/model/lfdv2.py:618-624`); with a tiny limit the per-level and
    global selections pick different candidate sets, so this test fails if
    decode silently falls back to the global top-k."""
    info = concat_level_info([(8, 8), (4, 4), (2, 2)], [8, 16, 32],
                             [(0, 32), (32, 64), (64, 128)])
    level_sizes = (64, 16, 4)
    P = info["points"].shape[0]
    C = 2
    LIM = 6  # << level sizes, forces real per-level truncation
    for trial in range(5):
        cls_logits = rng.randn(P, C).astype(np.float32) * 2 - 1
        reg = rng.randn(P, 4).astype(np.float32)

        # numpy mirror: per level, if size > LIM keep top-LIM points by max
        # class prob; then threshold pairs and class-offset NMS
        probs = _sigmoid(cls_logits)
        keep_points = []
        off = 0
        for n in level_sizes:
            lv = np.arange(off, off + n)
            if n > LIM:
                top = np.argsort(-probs[lv].max(-1), kind="stable")[:LIM]
                lv = lv[top]
            keep_points.append(lv)
            off += n
        keep_points = np.concatenate(keep_points)
        sel = np.zeros(P, bool)
        sel[keep_points] = True
        masked_logits = np.where(sel[:, None], cls_logits, -100.0)
        ref = reference_decode_mirror(
            masked_logits, reg, info["points"], info["ranges"], 0.3, 0.5,
            (64, 64), mode="sigmoid",
        )

        spec = DecodeSpec(num_classes=C, reg_mode="sigmoid", score_thr=0.3,
                          nms_iou=0.5, nms_budget=P * C, max_det=P * C,
                          per_level_limit=LIM)
        out = decode_predictions(
            jnp.asarray(cls_logits), jnp.asarray(reg),
            jnp.asarray(info["points"]), jnp.asarray(info["ranges"]),
            spec, (64.0, 64.0), level_sizes=level_sizes,
        )
        count = int(out["count"])
        got = np.concatenate(
            [
                np.asarray(out["labels"][:count])[:, None],
                np.asarray(out["scores"][:count])[:, None],
                np.asarray(out["boxes"][:count]),
            ],
            axis=1,
        )
        assert len(ref) == count, (len(ref), count)
        if count:
            ref = ref[np.argsort(-ref[:, 1], kind="stable")]
            np.testing.assert_allclose(got[:, 1], ref[:, 1], rtol=1e-5)
            np.testing.assert_array_equal(got[:, 0], ref[:, 0])
            np.testing.assert_allclose(got[:, 2:], ref[:, 2:], rtol=1e-4, atol=1e-3)


def test_lfdv2_decode_spec_sets_per_level_limit():
    from lfdtpu.models.lfdv2 import LFDv2
    from lfdtpu.ops.loss_wrappers import FocalLoss, IoULoss

    det = LFDv2(
        num_classes=1,
        regression_ranges=((0, 32), (32, 64)),
        point_strides=(8, 16),
        classification_loss_func=FocalLoss(),
        regression_loss_func=IoULoss(),
        pre_nms_bbox_limit=123,
    )
    assert det.decode_spec().per_level_limit == 123


def test_decode_masks_padded_points(rng):
    info = concat_level_info([(8, 8)], [8], [(0, 64)])
    P = info["points"].shape[0]
    cls_logits = np.full((P, 1), 5.0, np.float32)  # everything confident
    reg = np.zeros((P, 4), np.float32)
    spec = DecodeSpec(num_classes=1, reg_mode="exp", score_thr=0.1,
                      nms_iou=0.5, pre_nms_points=P, nms_budget=P, max_det=P)
    valid = jnp.asarray(info["points"])[:, 0] < 32  # right half is padding
    out = decode_predictions(
        jnp.asarray(cls_logits), jnp.asarray(reg),
        jnp.asarray(info["points"]), jnp.asarray(info["ranges"]),
        spec, (64.0, 32.0), point_valid=valid,
    )
    count = int(out["count"])
    boxes = np.asarray(out["boxes"][:count])
    assert count > 0
    assert (boxes[:, 0] <= 32).all()  # nothing from the padded region
