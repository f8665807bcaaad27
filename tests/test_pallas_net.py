# Block-level pallas interception parity: detector.net.apply with
# pallas_conv_interception must match the plain apply (interpret mode on
# CPU; the compiled path is exercised on TPU by tools/kernel_lab.py and
# the engine benchmarks).

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from lfdtpu.deploy.compile import cast_variables
from lfdtpu.deploy.pallas_net import (
    pallas_conv_interception,
    prepack_pair_weights,
)
from lfdtpu.zoo import ZOO


def test_block_interception_matches_plain_apply():
    det = ZOO["WIDERFACE-L"]()
    variables = det.init(jax.random.PRNGKey(0), input_hw=(64, 64), train=False)
    rv = cast_variables(variables, jnp.bfloat16)
    packs = prepack_pair_weights(rv)
    assert packs, "expected eligible 3x3 64->64 convs in WIDERFACE-L"

    x = jnp.asarray(
        np.random.RandomState(1).rand(1, 64, 64, 3) * 2 - 1, jnp.bfloat16
    )
    c0, r0 = det.net.apply(rv, x, train=False)
    with pltpu.force_tpu_interpret_mode():
        with pallas_conv_interception(packs):
            c1, r1 = det.net.apply(rv, x, train=False)

    c0, c1 = np.asarray(c0, np.float32), np.asarray(c1, np.float32)
    r0, r1 = np.asarray(r0, np.float32), np.asarray(r1, np.float32)
    # bf16-rounding-order differences only (folded BN runs in f32 in-kernel)
    assert np.abs(c0 - c1).max() <= 0.02 * max(np.abs(c0).max(), 1e-3)
    assert np.abs(r0 - r1).max() <= 0.02 * max(np.abs(r0).max(), 1e-3)


def test_interception_falls_through_in_train_mode():
    det = ZOO["WIDERFACE-S"]()
    variables = det.init(jax.random.PRNGKey(0), input_hw=(64, 64), train=True)
    packs = prepack_pair_weights(variables)
    x = jnp.asarray(np.random.RandomState(2).rand(1, 64, 64, 3), jnp.float32)
    # train=True (and f32) must not touch the pallas path at all — no
    # interpret context needed because no kernel may be called
    with pallas_conv_interception(packs):
        outs, _ = det.net.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
    assert outs[0].shape[0] == 1
