# Pallas TPU conv kernels for the shapes where XLA's native conv is far
# from the roofline (measured in tools/kernel_lab.py; see BENCH.md):
#
#   * 3x3 stride-1 conv at 64 channels — XLA hits the 25% MXU ceiling of a
#     64-wide contraction (64in x 64out uses a quarter of the 128x128 MXU).
#     Reformulated here as an "overlapped-pair im2col": each matmul row
#     computes TWO adjacent output pixels.  The pair's 3x4 input window
#     gives K = 3*4*64 = 768 (6 full 128-lane tiles) and N = 2*64 = 128
#     (one full tile); useful MACs are 2*576*64 of 768*128 = 75% — a 3x
#     higher ceiling than the native conv.  BN scale/bias, ReLU and the
#     residual add are fused into the epilogue.
#
#   * the stem conv (3 input channels, stride 2) — XLA pads cin 3->128 and
#     runs at <2 TFLOP/s.  Here the whole stem becomes one (M,128)@(128,128)
#     matmul per row-tile: A rows hold the 45 useful taps (3 rows x 5 cols
#     x 3 ch per output-pixel pair), normalization (x-mean)/std is applied
#     as a per-lane affine on A (unused lanes get inv_std=0), so the kernel
#     consumes RAW uint8 frames and emits normalized, convolved, BN-folded,
#     activated stem output in a single pass.
#
#     STATUS: interpret-mode verified, but current Mosaic CANNOT lower it —
#     the per-quad tap gather needs the shape cast (tile_h, w*3) ->
#     (tile_h, w/4, 12), rejected by infer-vector-layout ("unsupported
#     shape cast vector<32x1x384xbf16> -> vector<32x32x12xbf16>"; the f32
#     form is rejected identically).  Every alternative formulation ends at
#     the same wall: a lane-granularity gather with stride 12 (3 channels x
#     4 pixels), which Mosaic has no primitive for — rolls only rotate whole
#     rows, concats require matching lane offsets, there is no in-kernel
#     gather/shuffle, and grid/BlockSpec indexing is block-granular.
#     Checked variants: pair-quad reshape in f32 (same rejection), polyphase
#     / planar splits (need XLA-side strided gathers measured at 3.0-3.5 ms
#     — worse than the 1.0 ms stem they'd replace), channel-on-sublane
#     transposes (Mosaic 2D transpose granularity + 32-select assembly
#     costs ~4 ms), and gather-via-MXU with one-hot matrices (<=7% useful
#     MACs).  The kernel stays as the ready implementation for a Mosaic
#     release with sub-lane-tile shape casts; engines gate it behind
#     compile_inference(pallas_stem=True), exercised in interpret mode by
#     tests/test_conv_pallas.py and tests/test_deploy.py.
#
# These replace the reference's TensorRT-optimized first layers
# (`lfd/deployment/tensorrt/build_engine.py` relies on TRT to pick conv
# algorithms; on TPU we pick the formulation ourselves).
#
# All kernels are inference-path (no VJP): training keeps XLA convs.

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# --------------------------------------------------------------------------
# pair-im2col 3x3 stride-1 conv, cin == cout == 64
# --------------------------------------------------------------------------

def pack_pair_weights(kernel):
    """(3, 3, 64, 64) HWIO -> (768, 128) pair-matmul weights.

    A-lane order per dy block of 256 lanes (matching the roll-built A in
    `_pair_conv_kernel`): [c0 hi-half of prev pair | c3 lo-half of next
    pair | c1 | c2], 64 channels each, where c0..c3 are the pair window's
    input columns 2j-1..2j+2.  Output col j (even) taps c0..c2 with kernel
    dx 0..2; output j+1 taps c1..c3.
    """
    k = np.asarray(kernel, np.float32)
    assert k.shape[:2] == (3, 3) and k.shape[2] == k.shape[3] == 64, k.shape
    w = np.zeros((3, 4, 64, 2, 64), np.float32)  # (dy, pos, cin, pix, cout)
    pos_of_col = {0: 0, 3: 1, 1: 2, 2: 3}  # window col -> A lane position
    for dy in range(3):
        for dx in range(3):
            w[dy, pos_of_col[dx], :, 0, :] += k[dy, dx]      # even out: c0..c2
            w[dy, pos_of_col[dx + 1], :, 1, :] += k[dy, dx]  # odd out: c1..c3
    return w.reshape(768, 128)


def _pair_conv_kernel(up_ref, mid_ref, dn_ref, w_ref, sb_ref, res_ref,
                      out_ref, *, tile_h, w_pairs, relu, residual, f32_out):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    wp = w_pairs

    # (tile_h + 2, wp, 128) slab in pair-channel form.  up/dn arrive as
    # 8-row blocks (Pallas needs >=8 sublanes per block); the halo row is
    # the last / first row of those blocks respectively.
    mid = mid_ref[...]
    up = up_ref[7:8]
    dn = dn_ref[0:1]
    zero = jnp.zeros((1, wp, 128), mid.dtype)
    up = jnp.where(i == 0, zero, up)
    dn = jnp.where(i == n - 1, zero, dn)
    slab = jnp.concatenate([up, mid, dn], axis=0)

    # neighbour-pair halves via rolls (keeps every operand at layout
    # offset 0 — Mosaic cannot concat pieces with mismatched lane offsets;
    # rolls run in f32 because this Mosaic only rotates 32-bit data):
    # P lanes 0:64  = prev pair's hi half  (input col c0 = 2j-1)
    # P lanes 64:128 = next pair's lo half (input col c3 = 2j+2)
    slab32 = slab.astype(jnp.float32)
    prev = pltpu.roll(slab32, 1, 1)      # [jp] = slab[jp-1] (wraps at jp=0)
    nxt = pltpu.roll(slab32, wp - 1, 1)  # [jp] = slab[jp+1] (wraps at jp=wp-1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_h + 2, wp, 128), 2)
    jpix = jax.lax.broadcasted_iota(jnp.int32, (tile_h + 2, wp, 128), 1)
    p = jnp.where(lane < 64, pltpu.roll(prev, 64, 2), pltpu.roll(nxt, 64, 2))
    edge = jnp.logical_or(
        jnp.logical_and(jpix == 0, lane < 64),
        jnp.logical_and(jpix == wp - 1, lane >= 64),
    )
    p = jnp.where(edge, jnp.zeros_like(p), p).astype(slab.dtype)

    # A: per dy, 256 lanes [P | pair]; 3 dys -> 768
    a = jnp.concatenate(
        [jnp.concatenate([p[dy : dy + tile_h], slab[dy : dy + tile_h]], axis=-1)
         for dy in range(3)],
        axis=-1,
    )

    acc = jax.lax.dot_general(
        a, w_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc = acc * sb_ref[0:1] + sb_ref[1:2]
    if residual:
        acc = acc + res_ref[...].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    odt = jnp.float32 if f32_out else jnp.bfloat16
    out_ref[...] = acc.astype(odt)


def _pick_tile(h, budget=16):
    for t in range(min(budget, h), 0, -1):
        if h % t == 0:
            return t
    return 1


def _pick_tile_8(h, budget=32):
    """Largest multiple-of-8 tile <= budget dividing h (h must be % 8)."""
    assert h % 8 == 0, f"height {h} must be a multiple of 8 (pad upstream)"
    t = min(budget, h)
    t -= t % 8
    while t >= 8:
        if h % t == 0:
            return t
        t -= 8
    return 8


def _pick_tile_mult4(h, budget=32):
    """Largest multiple-of-4 tile <= budget dividing h (h must be % 4)."""
    assert h % 4 == 0, f"height {h} must be a multiple of 4 (pad upstream)"
    t = min(budget, h)
    t -= t % 4
    while t >= 4:
        if h % t == 0:
            return t
        t -= 4
    return 4


@functools.partial(
    jax.jit,
    static_argnames=("relu", "f32_out", "tile_h"),
)
def pair_conv3x3(x, w_pair, scale_bias, residual=None, *, relu=True,
                 f32_out=False, tile_h=None):
    """Fused 3x3 stride-1 SAME conv, 64 -> 64 channels, batch 1.

    x:          (H, W, 64) bf16, W even
    w_pair:     (768, 128) from pack_pair_weights (bf16)
    scale_bias: (2, 128) f32 — folded-BN per-channel scale row 0 / bias
                row 1, tiled x2 into pair form (identity: ones/zeros)
    residual:   optional (H, W, 64) added before the activation
    returns     (H, W, 64) bf16 (f32 if f32_out)
    """
    h, w, c = x.shape
    assert c == 64 and w % 2 == 0, (h, w, c)
    wp = w // 2
    if tile_h is None:
        tile_h = _pick_tile_8(h)
    assert h % tile_h == 0 and tile_h % 8 == 0, (h, tile_h)
    grid = (h // tile_h,)
    t8 = tile_h // 8
    nb8 = h // 8

    x3 = x.reshape(h, wp, 128)
    res3 = (residual if residual is not None else x).reshape(h, wp, 128)

    # 8-row halo blocks (Pallas needs >=8 sublane... here dim0 is untiled
    # but blocks must still tile the array): the up halo row i*tile_h - 1
    # is the LAST row of 8-block i*t8 - 1; the dn halo row i*tile_h +
    # tile_h is the FIRST row of 8-block i*t8 + t8 (clamped at the edges;
    # the kernel masks tiles 0 / n-1).
    up_spec = pl.BlockSpec(
        (8, wp, 128), lambda i: (jnp.clip(i * t8 - 1, 0, nb8 - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    dn_spec = pl.BlockSpec(
        (8, wp, 128), lambda i: (jnp.clip(i * t8 + t8, 0, nb8 - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    mid_spec = pl.BlockSpec((tile_h, wp, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    kern = functools.partial(
        _pair_conv_kernel,
        tile_h=tile_h,
        w_pairs=wp,
        relu=relu,
        residual=residual is not None,
        f32_out=f32_out,
    )
    odt = jnp.float32 if f32_out else jnp.bfloat16
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            up_spec,
            mid_spec,
            dn_spec,
            pl.BlockSpec((768, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            mid_spec,
        ],
        out_specs=pl.BlockSpec((tile_h, wp, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, wp, 128), odt),
        cost_estimate=pl.CostEstimate(
            flops=2 * h * wp * 768 * 128,
            bytes_accessed=2 * h * w * 64 * (3 if residual is not None else 2),
            transcendentals=0,
        ),
    )(x3, x3, x3, w_pair, scale_bias, res3)
    return out.reshape(h, w, 64)


# --------------------------------------------------------------------------
# fused stem: uint8 frame -> normalize -> 3x3 stride-2 conv (3 -> 64) -> BN
#             -> ReLU, one kernel
# --------------------------------------------------------------------------

STEM_K = 128          # padded contraction (45 useful taps)
_TAPS = 45            # 3 rows x 5 cols x 3 ch


def pack_stem(kernel, mean, std, scale=None, bias=None):
    """Fold normalize + conv + BN into stem-kernel constants.

    kernel: (3, 3, 3, 64) HWIO conv weights
    mean/std: per-channel normalize constants IN PIXEL UNITS (0..255)
    scale/bias: optional folded-BN per-channel affine on the conv output

    Returns (w (128, 128) bf16, affine (2, 128) f32 [A-lane mean | inv-std],
             out_sb (2, 128) f32 [scale | bias] in pair form).

    A-lane order: dy-major, then col (5), then channel (3):
    lane = dy*15 + col*3 + ch, cols are the pair window's 5 input columns
    c0..c4 = 4jp-1 .. 4jp+3.  Output pixel j=2jp taps cols c0..c2 (dx 0..2),
    j+1 taps c2..c4.
    """
    k = np.asarray(kernel, np.float32)
    assert k.shape == (3, 3, 3, 64), k.shape
    w = np.zeros((STEM_K, 128), np.float32)
    lane_mean = np.zeros((STEM_K,), np.float32)
    lane_inv = np.zeros((STEM_K,), np.float32)
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    for dy in range(3):
        for col in range(5):
            for ch in range(3):
                lane = dy * 15 + col * 3 + ch
                lane_mean[lane] = mean[ch]
                lane_inv[lane] = 1.0 / std[ch]
                if col < 3:                      # even output, dx = col
                    w[lane, :64] += k[dy, col, ch]
                if 2 <= col:                     # odd output, dx = col-2
                    w[lane, 64:] += k[dy, col - 2, ch]
    out_scale = np.ones((64,), np.float32) if scale is None else np.asarray(scale, np.float32)
    out_bias = np.zeros((64,), np.float32) if bias is None else np.asarray(bias, np.float32)
    affine = np.stack([lane_mean, lane_inv])
    out_sb = np.stack([np.tile(out_scale, 2), np.tile(out_bias, 2)])
    return (jnp.asarray(w, jnp.bfloat16), jnp.asarray(affine, jnp.float32),
            jnp.asarray(out_sb, jnp.float32))


def _stem_kernel(up_ref, mid_ref, dn_ref, w_ref, aff_ref, sb_ref, out_ref,
                 *, tile_h, w_out_pairs, relu, w_in):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    q = w_in // 4  # quads of input pixels; == w_out_pairs

    # Mosaic has no direct uint8->bf16 cast, and the tap-gather reshapes
    # below only lower for 32-bit element types (bf16 shape casts like
    # (32,1,384)->(32,32,12) are rejected by infer-vector-layout) — so the
    # whole A assembly runs in f32 and casts to bf16 only for the dot.
    def u8_to_f32(x):
        return x.astype(jnp.int32).astype(jnp.float32)

    mid = u8_to_f32(mid_ref[...])                      # (2*tile_h, w_in*3)
    up = u8_to_f32(up_ref[7:8])                        # (1, w_in*3)
    dn = u8_to_f32(dn_ref[0:1])
    aff = aff_ref[...]
    mean = aff[0]
    inv = aff[1]

    # row-halo handling: out-of-image rows contribute zero after normalize;
    # easiest is to zero their inv-std via masking the A rows below.
    slab = jnp.concatenate([up, mid, dn], axis=0)      # (2*tile_h + 2, w*3)
    # rows for local output row r: slab[2r], slab[2r+1], slab[2r+2]
    s = slab.reshape(tile_h + 1, 2, w_in * 3)
    dy0 = s[:tile_h, 0]
    dy1 = s[:tile_h, 1]
    dy2 = s[1:, 0]

    def taps(rows):
        # rows: (tile_h, w_in*3) -> (tile_h, q, 15): quad jp-1's last pixel
        # then quad jp's 4 pixels
        r = rows.reshape(tile_h, q, 12)
        prev = jnp.concatenate(
            [jnp.zeros((tile_h, 1, 3), rows.dtype), r[:, :-1, 9:]], axis=1
        )
        return jnp.concatenate([prev, r], axis=-1)

    a = jnp.concatenate([taps(dy0), taps(dy1), taps(dy2)], axis=-1)  # (th,q,45)
    a = jnp.concatenate(
        [a, jnp.zeros((tile_h, q, STEM_K - _TAPS), a.dtype)], axis=-1
    )
    a = (a - mean) * inv
    # Out-of-image taps must contribute ZERO (conv zero-padding), but the
    # per-lane normalize above turns a raw 0 into (0 - mean) * inv.  Two
    # sites need masking AFTER the affine (the bottom row never leaves the
    # image: stride-2 pad-1 on even H taps rows 2r-1..2r+1 <= h-1):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, STEM_K), 2)
    # 1. dy0 of global output row 0 (input row -1): whole dy0 block.
    row0 = jnp.logical_and(
        i == 0, jax.lax.broadcasted_iota(jnp.int32, (tile_h, 1, 1), 0) == 0
    )
    a = jnp.where(jnp.logical_and(row0, lane < 15), 0.0, a)
    # 2. c0 taps of quad 0 (input col -1): lanes dy*15 + {0,1,2}.
    quad0 = jax.lax.broadcasted_iota(jnp.int32, (1, q, 1), 1) == 0
    lane_c0 = jnp.logical_and(lane % 15 < 3, lane < _TAPS)
    a = jnp.where(jnp.logical_and(quad0, lane_c0), 0.0, a)

    a = a.reshape(tile_h * q, STEM_K).astype(jnp.bfloat16)
    acc = jnp.dot(a, w_ref[...], preferred_element_type=jnp.float32)
    acc = acc * sb_ref[0] + sb_ref[1]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[...] = acc.astype(jnp.bfloat16).reshape(tile_h, q * 128)


@functools.partial(jax.jit, static_argnames=("relu", "tile_h"))
def stem_conv(frame, w, affine, out_sb, *, relu=True, tile_h=None):
    """uint8 (H, W, 3) frame -> (H/2, W/2, 64) bf16 stem output.

    One kernel: normalize ((x - mean) / std folded into per-lane affine),
    3x3 stride-2 SAME conv 3 -> 64, folded-BN affine, ReLU.
    H, W must be even; W % 4 == 0.
    """
    h, w_in, c = frame.shape
    assert c == 3 and h % 8 == 0 and w_in % 4 == 0, frame.shape
    h_out, w_out = h // 2, w_in // 2
    if tile_h is None:
        tile_h = _pick_tile_mult4(h_out, 32)
    assert h_out % tile_h == 0 and tile_h % 4 == 0, (h_out, tile_h)
    grid = (h_out // tile_h,)
    t4 = tile_h // 4          # mid-block stride in 8-row units... (2T rows)
    nb8 = h // 8

    x2 = frame.reshape(h, w_in * 3)

    # halo rows arrive as 8-row blocks (Pallas min sublane block); with
    # tile_h % 4 == 0 the up halo row 2*i*tile_h - 1 is the LAST row of
    # block i*tile_h/4 - 1 and the dn halo row 2*i*tile_h + 2*tile_h is the
    # FIRST row of block i*tile_h/4 + tile_h/4.
    up_spec = pl.BlockSpec(
        (8, w_in * 3), lambda i: (jnp.clip(i * t4 - 1, 0, nb8 - 1), 0),
        memory_space=pltpu.VMEM,
    )
    mid_spec = pl.BlockSpec((2 * tile_h, w_in * 3), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    dn_spec = pl.BlockSpec(
        (8, w_in * 3), lambda i: (jnp.clip(i * t4 + t4, 0, nb8 - 1), 0),
        memory_space=pltpu.VMEM,
    )

    kern = functools.partial(
        _stem_kernel, tile_h=tile_h, w_out_pairs=w_out // 2, relu=relu,
        w_in=w_in,
    )
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            up_spec,
            mid_spec,
            dn_spec,
            pl.BlockSpec((STEM_K, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, STEM_K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_h, (w_out // 2) * 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h_out, (w_out // 2) * 128), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * h_out * (w_out // 2) * STEM_K * 128,
            bytes_accessed=h * w_in * 3 + h_out * w_out * 64 * 2,
            transcendentals=0,
        ),
    )(x2, x2, x2, w, affine, out_sb)
    return out.reshape(h_out, w_out, 64)
