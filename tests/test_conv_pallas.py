# Pallas conv kernel parity vs lax.conv (interpret mode on CPU; the same
# asserts run compiled on a real TPU via tools/kernel_lab.py).

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from lfdtpu.ops.conv_pallas import pair_conv3x3, pack_pair_weights


def _ref_conv(x, k, stride=1):
    return jax.lax.conv_general_dilated(
        x[None], k, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0]


@pytest.mark.parametrize("hw,tile", [((32, 16), None), ((48, 16), 16), ((24, 8), 8)])
def test_pair_conv3x3_matches_lax_conv(hw, tile):
    h, w = hw
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(h, w, 64) * 0.5, jnp.bfloat16)
    k = rng.randn(3, 3, 64, 64).astype(np.float32) * 0.1
    scale = rng.rand(64).astype(np.float32) + 0.5
    bias = rng.randn(64).astype(np.float32) * 0.1
    res = jnp.asarray(rng.randn(h, w, 64) * 0.5, jnp.bfloat16)

    ref = np.asarray(_ref_conv(x, jnp.asarray(k, jnp.bfloat16)), np.float32)
    ref = np.maximum(ref * scale + bias + np.asarray(res, np.float32), 0.0)

    wp = jnp.asarray(pack_pair_weights(k), jnp.bfloat16)
    sb = jnp.asarray(np.stack([np.tile(scale, 2), np.tile(bias, 2)]))
    with pltpu.force_tpu_interpret_mode():
        got = pair_conv3x3(x, wp, sb, residual=res, relu=True, tile_h=tile)
    got = np.asarray(got, np.float32)
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.02, rel


def test_pair_conv3x3_no_epilogue():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(16, 12, 64) * 0.5, jnp.bfloat16)
    k = rng.randn(3, 3, 64, 64).astype(np.float32) * 0.1
    ref = np.asarray(_ref_conv(x, jnp.asarray(k, jnp.bfloat16)), np.float32)
    wp = jnp.asarray(pack_pair_weights(k), jnp.bfloat16)
    sb = jnp.asarray(np.stack([np.ones(128, np.float32), np.zeros(128, np.float32)]))
    with pltpu.force_tpu_interpret_mode():
        got = pair_conv3x3(x, wp, sb, relu=False)
    rel = np.abs(np.asarray(got, np.float32) - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.02, rel


@pytest.mark.parametrize("hw", [(16, 24), (24, 16)])
def test_stem_conv_matches_lax_conv(hw):
    """The fused uint8 stem (normalize + 3x3/s2 conv 3->64 + BN + ReLU in
    one kernel) against the equivalent lax ops — ADVICE r2: the kernel now
    has the same interpret-mode oracle as pair_conv3x3."""
    from lfdtpu.ops.conv_pallas import pack_stem, stem_conv

    h, w = hw
    rng = np.random.RandomState(2)
    frame = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
    k = rng.randn(3, 3, 3, 64).astype(np.float32) * 0.1
    mean = np.array([120.0, 115.0, 110.0], np.float32)
    std = np.array([60.0, 58.0, 62.0], np.float32)
    scale = rng.rand(64).astype(np.float32) + 0.5
    bias = rng.randn(64).astype(np.float32) * 0.1

    xn = (frame.astype(np.float32) - mean) / std
    # torch padding (1,1) at stride 2, like ConvNormAct (not 'SAME')
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(xn, jnp.bfloat16)[None], jnp.asarray(k, jnp.bfloat16),
        (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0]
    ref = np.maximum(np.asarray(ref, np.float32) * scale + bias, 0.0)

    wq, affine, out_sb = pack_stem(k, mean, std, scale=scale, bias=bias)
    with pltpu.force_tpu_interpret_mode():
        got = stem_conv(jnp.asarray(frame), wq, affine, out_sb, relu=True)
    got = np.asarray(got, np.float32)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.03, rel


def test_pack_pair_weights_structure():
    k = np.zeros((3, 3, 64, 64), np.float32)
    k[1, 1, 0, 0] = 7.0  # centre tap, cin 0 -> cout 0
    w = pack_pair_weights(k)
    assert w.shape == (768, 128)
    # centre tap dy=1: even output (pix 0) reads window col c1 (lane block
    # 2 of [c0,c3,c1,c2]); odd output (pix 1) reads col c2 (block 3)
    base = 256  # dy=1 block
    assert w[base + 2 * 64 + 0, 0] == 7.0
    assert w[base + 3 * 64 + 0, 64] == 7.0
    assert np.count_nonzero(w) == 2
