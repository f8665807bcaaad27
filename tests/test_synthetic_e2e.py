# Synthetic end-to-end accuracy for ALL detector families (VERDICT r1
# next #7): full stack (loader -> on-device assignment -> loss ->
# optimizer -> decode -> NMS -> numpy COCO eval) must learn on synthetic
# scenes. The multiscale LFD run additionally asserts per-range recall so
# a silently-broken level fails.
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from synthetic_e2e import run_synthetic  # noqa: E402


@pytest.mark.slow
def test_synthetic_lfd_multiscale_per_range_recall():
    # threshold 0.42: the 4-scale task is much harder than the single-scale
    # ones (tiny objects drag the average; observed 0.48-0.55 across seeds);
    # the per-range recall assertion is the real dead-level guard
    m = run_synthetic("lfd", multiscale=True, epochs=80, threshold=0.42,
                      recall_threshold=0.6)
    assert len(m["per_range_recall"]) == 4


@pytest.mark.slow
def test_synthetic_lfdv2():
    m = run_synthetic("lfdv2", epochs=60, threshold=0.5)
    assert m["mAP_50"] > 0.5


@pytest.mark.slow
def test_synthetic_lfdv2q():
    # 80 epochs (not 60): the threaded loader makes batch order — and so
    # the training trajectory — load-dependent; observed 0.49 under heavy
    # host contention at 60 epochs vs ~0.7 unloaded.
    # lr 0.025 + whole-run clipping: the QFL/IoU coupling has a mutual-
    # starvation fixed point (reg weights = cls scores, cls targets = IoU;
    # both ~0 is self-sustaining) that an early lr-0.05 gradient spike can
    # knock the run into — the reference's LFDv2_ has the same coupling
    # (`lfdv2.py:1296-1318`), this is inherent to the loss, not the port
    m = run_synthetic("lfdv2q", epochs=80, threshold=0.5, base_lr=0.025,
                      clip_whole_run=True)
    assert m["mAP_50"] > 0.5


@pytest.mark.slow
def test_synthetic_fcos():
    m = run_synthetic("fcos", epochs=60, threshold=0.5)
    assert m["mAP_50"] > 0.5


@pytest.mark.slow
def test_int8_engine_preserves_synthetic_quality():
    """The accuracy leg of int8 parity: a TRT-style-calibrated int8
    engine must hold the fp32 engine's mAP_50 on the synthetic val set
    (the reference's int8 mode preserves accuracy through calibration;
    its README publishes int8 rows without an accuracy asterisk)."""
    m = run_synthetic("lfd", epochs=60, threshold=0.5, engine_quality=True)
    q = m["engine_mAP_50"]
    assert q["fp32"] > 0.5
    assert q["int8"] >= q["fp32"] - 0.05, q
