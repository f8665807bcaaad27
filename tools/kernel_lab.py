# Kernel lab: in-program microbenchmarks for the hot conv shapes.
#
# Timing methodology (see BENCH.md): the remote axon backend completes at
# D2H fetch of the program's own output, so every measurement here times a
# SINGLE program that loops the op N times in a dependent chain
# (lax.fori_loop carry), then fetches a tiny slice. Per-op time is the
# slope between N and 2N loop programs — this cancels the ~1.1 ms fixed
# per-program dispatch overhead exactly.

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def time_program(fn, *args, reps=5):
    """Median wall time of fn(*args) with own-output fetch barrier."""
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def per_op_ms(make_looped, n1=20, n2=40, reps=5):
    """Per-op time via two loop depths (cancels dispatch overhead)."""
    f1, args1 = make_looped(n1)
    f2, args2 = make_looped(n2)
    t1 = time_program(f1, *args1, reps=reps)
    t2 = time_program(f2, *args2, reps=reps)
    return (t2 - t1) / (n2 - n1) * 1000.0


def chain(op, x0, *consts):
    """make_looped factory for y = op(x, *consts) with y.shape == x.shape."""

    def make(n):
        @jax.jit
        def run(x, *cs):
            x = jax.lax.fori_loop(0, n, lambda i, x: op(x, *cs), x)
            return jnp.ravel(x)[:8]

        return run, (x0, *consts)

    return make


def chain_reentrant(op, x0, *consts):
    """Chain for shape-changing ops: feed a scalar of the output back into
    the (re-used) input so iterations are sequentially dependent."""

    def make(n):
        @jax.jit
        def run(x, *cs):
            def body(i, x):
                y = op(x, *cs)
                return x + (jnp.ravel(y)[0] * 1e-30).astype(x.dtype)

            x = jax.lax.fori_loop(0, n, body, x)
            return jnp.ravel(x)[:8]

        return run, (x0, *consts)

    return make


def conv_op(k, stride=1):
    def op(x, kern):
        return jax.lax.conv_general_dilated(
            x, kern, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    return op


def report(name, ms, useful_gflop):
    tf = useful_gflop / ms
    print(f"{name:48s} {ms:8.3f} ms   {tf:7.1f} TFLOP/s  ({100*tf/197:.1f}% of bf16 peak)")


def rnd(key, shape, dtype=jnp.bfloat16, scale=0.05):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype) * scale


if __name__ == "__main__":
    H, W, C = 272, 480, 64

    # floors
    x = rnd(1, (1, H, W, C))
    ms = per_op_ms(chain(lambda x: x + jnp.bfloat16(1.0), x))
    report(f"elementwise add @{H}x{W}x{C} bf16 (loop floor)", ms, 0.016)

    a = rnd(2, (4096, 4096))
    ms = per_op_ms(chain(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.bfloat16), a, rnd(3, (4096, 4096))))
    report("matmul 4096^3 bf16 (peak ref)", ms, 2 * 4096**3 / 1e9)

    # hot conv shapes
    kern = rnd(4, (3, 3, C, C))
    ms = per_op_ms(chain(conv_op(kern.shape[0]), x, kern))
    report(f"XLA conv3x3 {C}->{C} @{H}x{W} bf16", ms, H * W * C * C * 9 * 2 / 1e9)

    x128 = rnd(5, (1, H, W, 128))
    ms = per_op_ms(chain(conv_op(3), x128, rnd(6, (3, 3, 128, 128))))
    report(f"XLA conv3x3 128->128 @{H}x{W} bf16", ms, H * W * 128 * 128 * 9 * 2 / 1e9)

    ms = per_op_ms(chain(conv_op(1), x, rnd(7, (1, 1, C, C))))
    report(f"XLA conv1x1 {C}->{C} @{H}x{W} bf16", ms, H * W * C * C * 2 / 1e9)

    # stem: 3->64 stride2 @ 1088x1920 (1080p L)
    xs = rnd(8, (1, 1088, 1920, 3))
    ms = per_op_ms(chain_reentrant(conv_op(3, 2), xs, rnd(9, (3, 3, 3, 64))),
                   n1=10, n2=20)
    report("XLA stem conv3x3s2 3->64 @1088x1920 bf16", ms, 544 * 960 * 64 * 27 * 2 / 1e9)
