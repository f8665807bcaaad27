# Pipelined streaming serving: results must equal the synchronous loop
# bit-for-bit, arrive in submission order, and respect the depth bound.
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lfdtpu.deploy import (
    StreamingServer,
    compile_inference,
    make_device_preprocess,
    run_stream,
)

from tests.test_detector import tiny_lfd


def _engine_and_inputs(n=6):
    det = tiny_lfd()
    variables = det.init(jax.random.PRNGKey(0), (64, 64))
    pre = make_device_preprocess((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    engine = compile_inference(det, variables, (64, 64), "fp32",
                               preprocess=pre,
                               classification_threshold=0.01)
    rng = np.random.RandomState(7)
    imgs = [rng.randint(0, 255, (1, 64, 64, 3)).astype(np.uint8)
            for _ in range(n)]
    vhw = jnp.asarray([64.0, 64.0])
    return engine, [(jnp.asarray(im), vhw) for im in imgs]


def test_run_stream_matches_sync_in_order():
    engine, reqs = _engine_and_inputs()
    sync = [{k: np.asarray(v) for k, v in engine(*r).items()} for r in reqs]
    for depth in (1, 3, 10):  # degenerate, partial, deeper-than-stream
        got = list(run_stream(engine, iter(reqs), depth=depth))
        assert len(got) == len(sync)
        for g, s in zip(got, sync):
            for k in s:
                np.testing.assert_array_equal(g[k], s[k])


def test_run_stream_is_lazy_and_bounds_in_flight():
    engine, reqs = _engine_and_inputs()
    calls = []

    def counting_engine(*args):
        calls.append(len(calls))
        return engine(*args)

    stream = run_stream(counting_engine, iter(reqs), depth=2)
    assert calls == []  # nothing dispatched before iteration starts
    next(stream)
    # first yield happens once the pipeline is full: exactly `depth` calls
    assert len(calls) == 2
    list(stream)
    assert len(calls) == len(reqs)


def test_streaming_server_submit_drain():
    engine, reqs = _engine_and_inputs()
    sync = [{k: np.asarray(v) for k, v in engine(*r).items()} for r in reqs]
    srv = StreamingServer(engine, depth=3)
    got = []
    for r in reqs:
        res = srv.submit(*r)
        if res is not None:
            got.append(res)
    assert len(got) == len(reqs) - 2  # depth-1 still in flight
    got += list(srv.drain())
    for g, s in zip(got, sync):
        for k in s:
            np.testing.assert_array_equal(g[k], s[k])
    assert list(srv.drain()) == []  # idempotent once empty


def test_stream_depth_validation():
    with pytest.raises(ValueError):
        list(run_stream(lambda: None, [], depth=0))
    with pytest.raises(ValueError):
        StreamingServer(lambda: None, depth=0)
