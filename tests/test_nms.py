import numpy as np
import jax.numpy as jnp

import sys

import lfdtpu.ops.nms  # noqa: F401  (package attr `nms` is the function)

N = sys.modules["lfdtpu.ops.nms"]


REF_DETS = np.array(
    # reference doctest vectors (lfd/model/utils/nms.py:25-34)
    [
        [49.1, 32.4, 51.0, 35.9, 0.9],
        [49.3, 32.9, 51.0, 35.3, 0.9],
        [49.2, 31.8, 51.0, 35.4, 0.5],
        [35.1, 11.5, 39.1, 15.7, 0.5],
        [35.6, 11.8, 39.3, 14.2, 0.5],
        [35.3, 11.5, 39.9, 14.5, 0.4],
        [35.2, 11.7, 39.7, 15.7, 0.3],
    ],
    dtype=np.float32,
)


def test_nms_reference_doctest():
    kept, inds = N.nms(REF_DETS, 0.6)
    assert len(inds) == len(kept) == 3


def test_nms_mask_matches_numpy(rng):
    for trial in range(10):
        k = 64
        xy = rng.rand(k, 2) * 50
        wh = rng.rand(k, 2) * 30 + 1
        boxes = np.concatenate([xy, xy + wh], axis=-1).astype(np.float32)
        scores = rng.rand(k).astype(np.float32)
        dets = np.concatenate([boxes, scores[:, None]], axis=-1)
        ref_inds = N._nms_numpy_impl(dets, 0.5)
        keep = np.asarray(N.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
        got_inds = np.where(keep)[0]
        np.testing.assert_array_equal(np.sort(ref_inds), np.sort(got_inds))


def test_nms_mask_with_invalid_rows():
    boxes = jnp.asarray(
        [[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30]], dtype=jnp.float32
    )
    scores = jnp.asarray([0.9, 0.8, 0.7])
    valid = jnp.asarray([False, True, True])
    keep = np.asarray(N.nms_mask(boxes, scores, 0.5, valid=valid))
    # row 0 invalid: cannot keep nor suppress row 1
    np.testing.assert_array_equal(keep, [False, True, True])


def test_batched_nms_class_offsets():
    # same box, different classes -> both survive
    boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10]], dtype=jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    labels = jnp.asarray([0, 1])
    keep = np.asarray(N.batched_nms_jax(boxes, scores, labels, 0.5))
    assert keep.all()
    # same class -> one suppressed
    keep2 = np.asarray(N.batched_nms_jax(boxes, scores, jnp.asarray([1, 1]), 0.5))
    assert keep2.sum() == 1


def test_multiclass_nms_jax():
    boxes = jnp.asarray(
        [[0, 0, 10, 10], [1, 1, 11, 11], [30, 30, 40, 40], [0, 0, 5, 5]],
        dtype=jnp.float32,
    )
    scores = jnp.asarray([0.9, 0.85, 0.6, 0.01])
    keep, order, count = N.multiclass_nms_jax(
        boxes, scores, score_thr=0.05, iou_thr=0.5, max_num=10,
        class_agnostic=True,
    )
    keep = np.asarray(keep)
    assert int(count) == 2  # box1 suppressed by box0; box3 below threshold
    assert keep[0] and keep[2]
    assert not keep[1] and not keep[3]
    assert int(order[0]) == 0 and int(order[1]) == 2


def test_soft_nms_reference_doctest():
    dets = np.array(
        [
            [4.0, 3.0, 5.0, 3.0, 0.9],
            [4.0, 3.0, 5.0, 4.0, 0.9],
            [3.0, 1.0, 3.0, 1.0, 0.5],
            [3.0, 1.0, 3.0, 1.0, 0.5],
            [3.0, 1.0, 3.0, 1.0, 0.4],
            [3.0, 1.0, 3.0, 1.0, 0.0],
        ],
        dtype=np.float32,
    )
    new_dets, inds = N.soft_nms(dets, 0.6, sigma=0.5)
    assert len(inds) == len(new_dets) == 5


def test_pallas_nms_interpret_matches_lax(rng):
    # Pallas kernel in interpreter mode (CPU) must match the lax fixpoint
    import jax
    import jax.numpy as jnp

    from lfdtpu.ops.nms_pallas import nms_mask_pallas_sorted

    for trial in range(4):
        k = 128
        xy = rng.rand(k, 2) * 100
        wh = rng.rand(k, 2) * 40 + 1
        boxes = np.concatenate([xy, xy + wh], axis=-1).astype(np.float32)
        scores = rng.rand(k).astype(np.float32)
        valid = rng.rand(k) > 0.2
        order = np.argsort(-scores, kind="stable")
        sboxes = jnp.asarray(boxes[order])
        svalid = jnp.asarray(valid[order])

        lax_keep = np.asarray(
            N.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                       valid=jnp.asarray(valid), use_pallas=False)
        )
        pl_keep_sorted = np.asarray(
            nms_mask_pallas_sorted(sboxes, svalid, 0.5, interpret=True)
        )
        pl_keep = np.zeros(k, bool)
        pl_keep[order] = pl_keep_sorted
        np.testing.assert_array_equal(lax_keep, pl_keep)
