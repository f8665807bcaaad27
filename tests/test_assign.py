# Golden tests: the vectorized (padded, masked) assigners must reproduce the
# reference's per-image loop + ascending-sort scatter semantics
# (lfd/model/lfd.py:155-259, lfdv2.py:281-418, fcos.py:116-186), re-mirrored
# here in straightforward numpy.
import numpy as np
import jax.numpy as jnp

from lfdtpu.ops.assign import lfd_assign, lfdv2_assign, fcos_assign, centerness_target
from lfdtpu.ops.points import concat_level_info, compute_gray_ranges

INF = 1e8


def _geometry(points, gt):
    px = points[:, 0:1]
    py = points[:, 1:2]
    d_l = px - gt[:, 0]
    d_t = py - gt[:, 1]
    d_r = (gt[:, 0] + gt[:, 2] - 1) - px
    d_b = (gt[:, 1] + gt[:, 3] - 1) - py
    return np.stack([d_l, d_t, d_r, d_b], axis=-1)


def _measure(mode, gt, delta):
    if mode == "longer":
        return np.broadcast_to(np.maximum(gt[:, 2], gt[:, 3]), delta.shape[:2])
    if mode == "shorter":
        return np.broadcast_to(np.minimum(gt[:, 2], gt[:, 3]), delta.shape[:2])
    if mode == "sqrt":
        return np.broadcast_to(np.sqrt(gt[:, 2] * gt[:, 3]), delta.shape[:2])
    return delta.max(-1)


def lfd_assign_mirror(points, strides, rr, gr, gt, labels, C, mode, normalize):
    P = len(points)
    cls_t = np.zeros((P, C), np.float64)
    reg_t = np.zeros((P, 4), np.float64)
    if len(gt) == 0:
        return cls_t, reg_t
    delta = _geometry(points, gt)
    cx = gt[:, 0] + gt[:, 2] / 2.0
    cy = gt[:, 1] + gt[:, 3] / 2.0
    ax = np.abs(points[:, 0:1] - cx) / (strides[:, None] / 2.0)
    ay = np.abs(points[:, 1:2] - cy) / (strides[:, None] / 2.0)
    ax = np.where(ax < 1, 1.0, ax)
    ay = np.where(ay < 1, 1.0, ay)
    scores = np.sqrt(1.0 / ax) * np.sqrt(1.0 / ay)
    m = _measure(mode, gt, delta)
    rdelta = delta / rr[:, None, 1:2] if normalize else delta
    hit = delta.min(-1) >= 0
    green = (rr[:, None, 0] <= m) & (m <= rr[:, None, 1]) & hit
    gray = (
        ((gr[:, None, 0] <= m) & (m < rr[:, None, 0]))
        | ((rr[:, None, 1] < m) & (m <= gr[:, None, 1]))
    ) & hit
    for p in range(P):
        order = np.argsort(scores[p], kind="stable")
        for j in order:
            if green[p, j]:
                cls_t[p, labels[j]] = scores[p, j]
        for j in order:
            if gray[p, j]:
                cls_t[p, labels[j]] = -1
        filt = scores[p] * (green[p] & ~gray[p])
        reg_t[p] = rdelta[p, filt.argmax()]
    return cls_t, reg_t


def _pad(gt, labels, n_max):
    n = len(gt)
    gtp = np.zeros((n_max, 4), np.float32)
    lbp = np.zeros((n_max,), np.int32)
    mask = np.zeros((n_max,), bool)
    gtp[:n] = gt
    lbp[:n] = labels
    mask[:n] = True
    return gtp, lbp, mask


def _level_info():
    ranges = ((0, 32), (32, 64))
    gray = compute_gray_ranges(ranges, (0.9, 1.1))
    return concat_level_info([(6, 6), (3, 3)], [8, 16], ranges, gray_ranges=gray)


def _random_case(rng, n_gt, C):
    gt = np.stack(
        [
            rng.uniform(0, 40, n_gt),
            rng.uniform(0, 40, n_gt),
            rng.uniform(2, 50, n_gt),
            rng.uniform(2, 50, n_gt),
        ],
        axis=-1,
    ).astype(np.float32)
    labels = rng.randint(0, C, n_gt).astype(np.int32)
    return gt, labels


def test_lfd_assign_matches_reference_semantics(rng):
    info = _level_info()
    C = 3
    for mode in ["dist", "longer", "shorter", "sqrt"]:
        for normalize in [False, True]:
            for trial in range(5):
                gt, labels = _random_case(rng, rng.randint(1, 6), C)
                ref_cls, ref_reg = lfd_assign_mirror(
                    info["points"], info["strides"], info["ranges"], info["gray_ranges"],
                    gt, labels, C, mode, normalize,
                )
                gtp, lbp, mask = _pad(gt, labels, 8)
                cls_t, reg_t = lfd_assign(
                    jnp.asarray(info["points"]), jnp.asarray(info["strides"]),
                    jnp.asarray(info["ranges"]), jnp.asarray(info["gray_ranges"]),
                    jnp.asarray(gtp), jnp.asarray(lbp), jnp.asarray(mask),
                    C, range_assign_mode=mode, normalize_by_range=normalize,
                )
                cls_t = np.asarray(cls_t)
                reg_t = np.asarray(reg_t)
                np.testing.assert_allclose(cls_t, ref_cls, atol=1e-5)
                # regression targets compared only where the loss uses them:
                # non-gray positives (lfd.py:314-323)
                pos = (ref_cls.min(-1) >= 0) & (ref_cls.max(-1) >= 0.001)
                np.testing.assert_allclose(reg_t[pos], ref_reg[pos], atol=1e-4)


def test_lfd_assign_no_gt():
    info = _level_info()
    gtp = np.zeros((8, 4), np.float32)
    lbp = np.zeros((8,), np.int32)
    mask = np.zeros((8,), bool)
    cls_t, reg_t = lfd_assign(
        jnp.asarray(info["points"]), jnp.asarray(info["strides"]),
        jnp.asarray(info["ranges"]), jnp.asarray(info["gray_ranges"]),
        jnp.asarray(gtp), jnp.asarray(lbp), jnp.asarray(mask), 3,
    )
    assert np.all(np.asarray(cls_t) == 0)
    assert np.all(np.asarray(reg_t) == 0)


def lfdv2_assign_mirror(points, strides, rr, gr, gt, labels, C, mode, normalize):
    P = len(points)
    cls_t = np.zeros((P, C), np.float64)
    reg_t = np.zeros((P, 4), np.float64)
    if len(gt) == 0:
        return cls_t, reg_t
    delta = _geometry(points, gt)
    hit = delta.min(-1) >= 0
    fdelta = delta * hit[..., None]
    lr = fdelta[..., [0, 2]]
    tb = fdelta[..., [1, 3]]
    scores = np.sqrt(
        (np.clip(lr.min(-1), 0, None) / np.clip(lr.max(-1), 0.01, None))
        * (np.clip(tb.min(-1), 0, None) / np.clip(tb.max(-1), 0.01, None))
    )
    cx = gt[:, 0] + gt[:, 2] / 2.0
    cy = gt[:, 1] + gt[:, 3] / 2.0
    s2 = strides[:, None] / 2.0
    core = (
        (points[:, 0:1] >= cx - s2)
        & (points[:, 0:1] <= cx + s2)
        & (points[:, 1:2] >= cy - s2)
        & (points[:, 1:2] <= cy + s2)
        & hit
    )
    scores = scores * (~core) + core
    m = _measure(mode, gt, delta)
    rdelta = delta / rr[:, None, 1:2] if normalize else delta
    left = (m - gr[:, None, 0]) / np.clip(rr[:, None, 0] - gr[:, None, 0], 0.01, None)
    li = (gr[:, None, 0] <= m) & (m < rr[:, None, 0])
    mid = (rr[:, None, 0] <= m) & (m <= rr[:, None, 1])
    right = (gr[:, None, 1] - m) / np.clip(gr[:, None, 1] - rr[:, None, 1], 0.01, None)
    ri = (rr[:, None, 1] < m) & (m <= gr[:, None, 1])
    scores = scores * (left * li + mid + right * ri)
    pos = scores > 0
    for p in range(P):
        order = np.argsort(scores[p], kind="stable")
        for j in order:
            if pos[p, j]:
                cls_t[p, labels[j]] = scores[p, j]
        reg_t[p] = rdelta[p, scores[p].argmax()]
    return cls_t, reg_t


def test_lfdv2_assign_matches_reference_semantics(rng):
    info = _level_info()
    C = 3
    for mode in ["longer", "sqrt"]:
        for trial in range(5):
            gt, labels = _random_case(rng, rng.randint(1, 6), C)
            ref_cls, ref_reg = lfdv2_assign_mirror(
                info["points"], info["strides"], info["ranges"], info["gray_ranges"],
                gt, labels, C, mode, False,
            )
            gtp, lbp, mask = _pad(gt, labels, 8)
            cls_t, reg_t = lfdv2_assign(
                jnp.asarray(info["points"]), jnp.asarray(info["strides"]),
                jnp.asarray(info["ranges"]), jnp.asarray(info["gray_ranges"]),
                jnp.asarray(gtp), jnp.asarray(lbp), jnp.asarray(mask),
                C, range_assign_mode=mode,
            )
            np.testing.assert_allclose(np.asarray(cls_t), ref_cls, atol=1e-5)
            pos = ref_cls.max(-1) >= 0.001
            np.testing.assert_allclose(np.asarray(reg_t)[pos], ref_reg[pos], atol=1e-4)


def fcos_assign_mirror(points, rr, gt, labels, C):
    P = len(points)
    if len(gt) == 0:
        return np.full((P,), C, np.int32), np.zeros((P, 4))
    delta = _geometry(points, gt)
    inside = delta.min(-1) > 0
    maxd = delta.max(-1)
    in_range = (maxd >= rr[:, None, 0]) & (maxd <= rr[:, None, 1])
    areas = np.broadcast_to(gt[:, 2] * gt[:, 3], delta.shape[:2]).copy()
    valid = inside & in_range
    areas = areas * valid + INF * (~valid)
    idx = areas.argmin(1)
    mina = areas.min(1)
    lbl = np.where(mina >= INF, C, labels[idx]).astype(np.int32)
    reg = delta[np.arange(P), idx]
    return lbl, reg


def test_fcos_assign_matches_reference_semantics(rng):
    info = _level_info()
    C = 3
    for trial in range(8):
        gt, labels = _random_case(rng, rng.randint(1, 6), C)
        ref_lbl, ref_reg = fcos_assign_mirror(info["points"], info["ranges"], gt, labels, C)
        gtp, lbp, mask = _pad(gt, labels, 8)
        lbl, reg = fcos_assign(
            jnp.asarray(info["points"]), jnp.asarray(info["ranges"]),
            jnp.asarray(gtp), jnp.asarray(lbp), jnp.asarray(mask), C,
        )
        np.testing.assert_array_equal(np.asarray(lbl), ref_lbl)
        pos = ref_lbl != C
        np.testing.assert_allclose(np.asarray(reg)[pos], ref_reg[pos], atol=1e-4)


def test_centerness_target():
    # sqrt((min/max lr)*(min/max tb)) — fcos.py:211-215
    reg = jnp.asarray([[2.0, 8.0, 8.0, 2.0], [5.0, 5.0, 5.0, 5.0]])
    got = np.asarray(centerness_target(reg))
    np.testing.assert_allclose(got, [np.sqrt(0.25 * 0.25), 1.0], atol=1e-6)
