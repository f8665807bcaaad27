# Data-parallel sharding tests on the 8-device virtual CPU mesh:
# the sharded train step must produce the same result as single-device.
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lfdtpu.execution.optim import SGD
from lfdtpu.parallel import make_train_step, make_eval_step
from lfdtpu.parallel.data_parallel import create_train_state
from lfdtpu.parallel.mesh import make_mesh, shard_batch

from tests.test_detector import tiny_lfd, _batch


def test_mesh_has_8_devices():
    assert jax.device_count() >= 8
    mesh = make_mesh()
    assert mesh.size >= 8


def _mk_batch(rng, B):
    images = rng.rand(B, 64, 64, 3).astype(np.float32)
    gt = np.zeros((B, 4, 4), np.float32)
    gt[:, 0] = [8, 8, 24, 24]
    labels = np.zeros((B, 4), np.int32)
    mask = np.zeros((B, 4), bool)
    mask[:, 0] = True
    return images, gt, labels, mask


def test_sharded_step_matches_single_device(rng):
    det = tiny_lfd()
    opt = SGD(momentum=0.9, weight_decay=1e-4)
    B = 8
    images, gt, labels, mask = _mk_batch(rng, B)

    # single device
    state1 = create_train_state(det, opt, jax.random.PRNGKey(0), (64, 64))
    step1 = make_train_step(det, opt, (64, 64), mesh=None, clip_max_norm=10.0, donate=False)
    s1, m1 = step1(state1, jnp.asarray(images), jnp.asarray(gt),
                   jnp.asarray(labels), jnp.asarray(mask),
                   jnp.float32(0.01), jnp.bool_(True))

    # 8-device mesh
    mesh = make_mesh(jax.devices()[:8])
    state8 = create_train_state(det, opt, jax.random.PRNGKey(0), (64, 64))
    step8 = make_train_step(det, opt, (64, 64), mesh=mesh, clip_max_norm=10.0, donate=False)
    im, g, l, mk = shard_batch(mesh, images, gt, labels, mask)
    s8, m8 = step8(state8, im, g, l, mk, jnp.float32(0.01), jnp.bool_(True))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_eval_step_sharded(rng):
    det = tiny_lfd()
    opt = SGD()
    mesh = make_mesh(jax.devices()[:8])
    state = create_train_state(det, opt, jax.random.PRNGKey(0), (64, 64))
    fwd = make_eval_step(det, mesh)
    images = shard_batch(mesh, rng.rand(8, 64, 64, 3).astype(np.float32))
    cls_o, reg_o = fwd(state, images)
    P = det.num_points((64, 64))
    assert cls_o.shape == (8, P, 1)
    assert reg_o.shape == (8, P, 4)


def test_spatial_sharded_eval(rng):
    # 2x4 (data x spatial) mesh: image height sharded over `spatial`;
    # GSPMD inserts conv halo exchanges (4K-inference analogue of SP)
    from lfdtpu.execution.optim import SGD
    from lfdtpu.parallel.data_parallel import create_train_state, make_eval_step
    from lfdtpu.parallel.mesh import make_mesh, spatial_image_sharding

    det = tiny_lfd()
    opt = SGD()
    mesh = make_mesh(jax.devices()[:8], spatial=4)
    state = create_train_state(det, opt, jax.random.PRNGKey(0), (64, 64))
    fwd_sp = make_eval_step(det, mesh, spatial=True)
    images_np = rng.rand(2, 64, 64, 3).astype(np.float32)
    images = jax.device_put(images_np, spatial_image_sharding(mesh))
    cls_sp, reg_sp = fwd_sp(state, images)

    # reference: unsharded single-device result must match
    fwd_ref = make_eval_step(det, None)
    cls_ref, reg_ref = fwd_ref(state, jnp.asarray(images_np))
    np.testing.assert_allclose(np.asarray(cls_sp), np.asarray(cls_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(reg_sp), np.asarray(reg_ref),
                               rtol=1e-4, atol=1e-5)


def test_mixed_precision_and_remat_train_step(rng):
    from lfdtpu.execution.optim import SGD
    from lfdtpu.parallel.data_parallel import create_train_state, make_train_step

    det = tiny_lfd()
    opt = SGD(momentum=0.9)
    images, gt, labels, mask = _mk_batch(rng, 4)
    args = (jnp.asarray(images), jnp.asarray(gt), jnp.asarray(labels),
            jnp.asarray(mask), jnp.float32(0.01), jnp.bool_(True))

    for kwargs in (dict(mixed_precision=True), dict(remat=True),
                   dict(mixed_precision=True, remat=True)):
        state = create_train_state(det, opt, jax.random.PRNGKey(0), (64, 64))
        step = make_train_step(det, opt, (64, 64), mesh=None,
                               clip_max_norm=10.0, donate=False, **kwargs)
        s1, m1 = step(state, *args)
        s2, m2 = step(s1, *args)
        assert np.isfinite(float(m2["loss"]))
        # master params stay f32; loss decreases over two identical steps
        for leaf in jax.tree.leaves(s2.params):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                assert leaf.dtype == jnp.float32
        assert float(m2["loss"]) < float(m1["loss"]) * 1.5
