import numpy as np
import jax
import jax.numpy as jnp

from lfdtpu.ops import losses as L


def _np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def focal_mirror(logits, targets, gamma, alpha):
    # direct transcription of the CUDA forward semantics
    # (sigmoid_focal_loss_cuda.cu:24-59)
    N, C = logits.shape
    out = np.zeros_like(logits)
    for n in range(N):
        t = targets[n]
        for d in range(C):
            x = logits[n, d]
            p = _np_sigmoid(x)
            term1 = (1 - p) ** gamma * np.log(max(p, 1.1754943508222875e-38))
            term2 = p**gamma * (
                -x * (x >= 0) - np.log1p(np.exp(x - 2 * x * (x >= 0)))
            )
            if t == d:
                out[n, d] = -term1 * alpha
            elif t >= 0:
                out[n, d] = -term2 * (1 - alpha)
    return out


def test_sigmoid_focal_loss_forward(rng):
    logits = rng.randn(20, 4).astype(np.float32) * 4
    targets = rng.randint(0, 5, 20).astype(np.int32)  # 4 == background
    ref = focal_mirror(logits, targets, 2.0, 0.25)
    got = L.sigmoid_focal_loss(
        jnp.asarray(logits), jnp.asarray(targets), reduction="none"
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-6)


def test_sigmoid_focal_loss_grad_matches_numeric(rng):
    # the handwritten VJP (CUDA backward formula) must equal the numeric
    # derivative of the forward; run in x64 so finite differences are valid
    jax.config.update("jax_enable_x64", True)
    try:
        logits = rng.randn(8, 3)
        targets = rng.randint(0, 4, 8).astype(np.int32)

        def f(x):
            return L.sigmoid_focal_loss(x, jnp.asarray(targets), reduction="mean")

        g = jax.grad(f)(jnp.asarray(logits, dtype=jnp.float64))
        eps = 1e-6
        gn = np.zeros_like(logits)
        for i in range(8):
            for j in range(3):
                lp = logits.copy()
                lm = logits.copy()
                lp[i, j] += eps
                lm[i, j] -= eps
                gn[i, j] = (
                    float(f(jnp.asarray(lp))) - float(f(jnp.asarray(lm)))
                ) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g), gn, rtol=1e-5, atol=1e-9)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_focal_loss_extreme_logits_finite():
    logits = jnp.asarray([[-200.0, 200.0], [50.0, -50.0]])
    targets = jnp.asarray([0, 2], dtype=jnp.int32)
    loss = L.sigmoid_focal_loss(logits, targets, reduction="none")
    g = jax.grad(
        lambda x: L.sigmoid_focal_loss(x, targets, reduction="mean")
    )(logits)
    assert np.isfinite(np.asarray(loss)).all()
    assert np.isfinite(np.asarray(g)).all()


def test_weight_reduce_semantics():
    # matches lfd/model/losses/utils.py docstring example (:70-85)
    loss = jnp.asarray([1.0, 1.0, 2.0])
    assert float(L.weight_reduce_loss(loss)) == np.float32(4 / 3)
    w = jnp.asarray([1.0, 0.0, 1.0])
    assert float(L.weight_reduce_loss(loss, w)) == 1.0
    np.testing.assert_array_equal(
        np.asarray(L.weight_reduce_loss(loss, reduction="none")), [1, 1, 2]
    )
    assert float(L.weight_reduce_loss(loss, w, avg_factor=2)) == 1.5


def test_iou_loss_basics():
    pred = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    target = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    assert float(L.iou_loss(pred, target)) < 1e-5
    # IoU = 0.5 -> -log(0.5)
    pred2 = jnp.asarray([[0.0, 0.0, 10.0, 5.0]])
    target2 = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    np.testing.assert_allclose(float(L.iou_loss(pred2, target2)), -np.log(0.5), rtol=1e-5)


def test_giou_diou_ciou_perfect_overlap_zero():
    b = jnp.asarray([[3.0, 4.0, 20.0, 30.0]])
    for fn in [L.giou_loss, L.diou_loss, L.ciou_loss]:
        assert abs(float(fn(b, b))) < 1e-5


def test_giou_disjoint():
    p = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])
    t = jnp.asarray([[3.0, 3.0, 4.0, 4.0]])
    # IoU=0, enclose=16, union=2 -> giou = -(16-2)/16, loss = 1+14/16
    np.testing.assert_allclose(float(L.giou_loss(p, t)), 1 + 14 / 16, rtol=1e-4)


def test_iou_weight_shape_reduction(rng):
    pred = jnp.asarray(rng.rand(5, 4) * 10)
    target = jnp.asarray(rng.rand(5, 4) * 10)
    w4 = jnp.asarray(rng.rand(5, 4))
    w1 = jnp.mean(w4, axis=-1)
    a = float(L.iou_loss(pred, target, weight=w4, avg_factor=3.0))
    b = float(L.iou_loss(pred, target, weight=w1, avg_factor=3.0))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_cross_entropy_matches_logsoftmax(rng):
    x = rng.randn(6, 5).astype(np.float32)
    y = rng.randint(0, 5, 6).astype(np.int32)
    got = L.cross_entropy_loss(jnp.asarray(x), jnp.asarray(y), reduction="none")
    lse = np.log(np.exp(x).sum(-1))
    ref = lse - x[np.arange(6), y]
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4)


def test_bce_soft_targets(rng):
    x = rng.randn(6, 3).astype(np.float32)
    t = rng.rand(6, 3).astype(np.float32)
    got = L.binary_cross_entropy_loss(jnp.asarray(x), jnp.asarray(t), reduction="none")
    p = _np_sigmoid(x)
    ref = -(t * np.log(p) + (1 - t) * np.log(1 - p))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-6)


def test_quality_focal_loss(rng):
    # positives supervised toward score, negatives toward 0 (gfocal_loss.py:10-51)
    x = rng.randn(6, 4).astype(np.float32)
    label = np.array([0, 2, 4, 4, 1, 3], dtype=np.int32)  # 4 == bg
    score = rng.rand(6).astype(np.float32)
    got = np.asarray(
        L.quality_focal_loss(jnp.asarray(x), (jnp.asarray(label), jnp.asarray(score)), reduction="none")
    )
    p = _np_sigmoid(x)
    bce0 = -np.log(1 - p)
    ref = bce0 * p**2
    for n in range(6):
        if label[n] < 4:
            c = label[n]
            s = score[n]
            bce = -(s * np.log(p[n, c]) + (1 - s) * np.log(1 - p[n, c]))
            ref[n, c] = bce * abs(s - p[n, c]) ** 2
    np.testing.assert_allclose(got, ref.sum(-1), rtol=1e-3, atol=1e-5)


def test_distribution_focal_loss():
    pred = jnp.asarray([[0.0, 2.0, 1.0, 0.5]])
    label = jnp.asarray([1.3])
    got = float(L.distribution_focal_loss(pred, label, reduction="none")[0])
    logp = np.log(np.exp([0.0, 2.0, 1.0, 0.5]) / np.exp([0.0, 2.0, 1.0, 0.5]).sum())
    ref = -logp[1] * 0.7 + -logp[2] * 0.3
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_smooth_l1():
    pred = jnp.asarray([0.0, 2.0, 3.0])
    target = jnp.asarray([1.0, 1.0, 1.0])
    got = np.asarray(L.smooth_l1_loss(pred, target, reduction="none"))
    np.testing.assert_allclose(got, [0.5, 0.5, 1.5])
