"""Pipelined (depth-k) streaming inference over one compiled engine.

A synchronous predict->fetch serving loop pays this backend's fixed
per-call dispatch window (~1.1 ms measured — BENCH.md attribution) and
the output-fetch round trip SERIALLY on every image: at 640x480 that
floor is 50%+ of the wall time, which is exactly why the batch-1 sweep
loses small cells whose device-only time wins (the dev-* campaign
cells). jax dispatch is asynchronous, so keeping `depth` calls in
flight overlaps the next images' host dispatch and H2D with the
current device execution; sustained throughput approaches pure device
time while per-image LATENCY grows to ~depth x device time. The
reference's serving harness is a synchronous batch-1 TRT loop
(`inference_latency_evaluation.py` per workload — it has no streaming
mode), so this is the repo's own capability, like batched serving.

Two backend facts shape the implementation (verify-skill notes, both
measured):
  - `jax.block_until_ready` returns at ENQUEUE on the remote-attached
    backend, so completion can only be observed by fetching an output.
    The in-order execution queue makes fetching the OLDEST in-flight
    call's output a true completion barrier for it.
  - Fetching an executable's OWN outputs is safe; it is fetches of
    other programs' outputs that permanently degrade a process. A
    stream fetches only the served engine's outputs.
"""
from collections import deque

import jax
import numpy as np


def _fetch(out):
    """Device result -> host (numpy) result; blocks until computed.
    Tree-mapped so namedtuple/dataclass outputs reconstruct correctly
    (a hand-rolled `type(out)(gen)` breaks namedtuple constructors).

    Starts EVERY leaf's D2H copy before the first blocking read: a
    blocking `np.asarray` per leaf pays the link round trip serially
    (~30 ms/buffer on the remote tunnel — a 4-buffer decode dict cost
    ~121 ms/image in the round-4 sync rows), while `copy_to_host_async`
    on all leaves first lets the copies run concurrently, so a
    multi-buffer result pays ~ONE round trip total."""
    _prefetch(out)
    return jax.tree.map(np.asarray, out)


def _prefetch(out):
    """Start the D2H copies of a result without blocking. On a
    remote-attached backend the blocking fetch is LATENCY-bound (~30 ms
    round trip here); starting the copy at submit time lets transfers of
    older results overlap younger results' device execution, so the
    stream's fetch cost pipelines instead of serializing per image."""
    for leaf in jax.tree.leaves(out):
        async_copy = getattr(leaf, "copy_to_host_async", None)
        if async_copy is not None:
            async_copy()


def run_stream(engine, requests, depth=4, host_prefetch=True):
    """Serve an engine over a request stream with `depth` calls in flight.

    Args:
      engine: a `compile_inference` engine (or any jitted callable).
      requests: iterable of argument TUPLES for the engine, e.g.
        `(images_uint8, valid_hw)` pairs. Consumed lazily — a live
        camera/queue generator works.
      depth: max in-flight calls. 1 degenerates to the synchronous loop;
        4 is enough to hide the measured ~1.1 ms dispatch floor behind
        any cell's device time without hoarding device buffers.
      host_prefetch: start each result's D2H copy at submit time
        (`copy_to_host_async`) so transfer latency pipelines behind
        compute. Harmless where D2H is cheap; decisive over a
        high-latency link.

    Yields one fetched (numpy) result per request, IN SUBMISSION ORDER.
    """
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    q = deque()
    for args in requests:
        out = engine(*args)
        if host_prefetch:
            _prefetch(out)
        q.append(out)
        if len(q) >= depth:
            yield _fetch(q.popleft())
    while q:
        yield _fetch(q.popleft())


class StreamingServer:
    """Explicit submit/collect form of `run_stream` for push-style callers
    (e.g. an RPC handler that cannot hand over an iterator).

    `submit(*args)` enqueues one engine call and returns the completed
    result of an OLDER call once the pipeline is full (else None);
    `drain()` yields the remaining in-flight results. Results always
    come back in submission order.
    """

    def __init__(self, engine, depth=4, host_prefetch=True):
        if depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        self.engine = engine
        self.depth = depth
        self.host_prefetch = host_prefetch
        self._q = deque()

    def submit(self, *args):
        out = self.engine(*args)
        if self.host_prefetch:
            _prefetch(out)
        self._q.append(out)
        if len(self._q) >= self.depth:
            return _fetch(self._q.popleft())
        return None

    def drain(self):
        while self._q:
            yield _fetch(self._q.popleft())
