# The published-number pipeline: campaign jsonl -> merge (stale-row
# retirement, ms_device attach) -> render (reference-flagged tables) ->
# update_bench_md (marker splice). BENCH.md's integrity depends on these
# behaviors, so they are pinned here on synthetic rows.
import json
import os
import sys

import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
sys.path.insert(0, TOOLS)


def _cell(model, precision, h, w, ms, **extra):
    r = dict(model=model, precision=precision, height=h, width=w,
             ms_per_image=ms, fps=1000.0 / ms, ms_p25=ms * 0.98,
             ms_p75=ms * 1.02, id=f"{model}-{precision}-{h}")
    r.update(extra)
    return r


def test_merge_drops_stale_int8_rows_and_attaches_device_time(tmp_path):
    """int8 sweep rows not re-measured by a fused campaign cell must NOT
    be published (they measured the retired unfused engine); ms_device
    cells attach to their wall-slope row."""
    from merge_campaign_results import load_jsonl

    jsonl = tmp_path / "c.jsonl"
    rows = [
        _cell("WIDERFACE-L", "int8", 1080, 1920, 6.38),
        dict(model="WIDERFACE-L", precision="int8", height=1080, width=1920,
             ms_device=6.79, id="dev-int8-L-1080"),
        dict(id="broken", error="boom"),
        dict(id="broken", model="WIDERFACE-L", precision="bf16", height=720,
             width=1280, ms_per_image=3.3, fps=300.0),  # retry succeeded
    ]
    jsonl.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    loaded = load_jsonl([str(jsonl)])
    by_id = {r["id"]: r for r in loaded}
    # retry result wins over the earlier error for the same id
    assert "error" not in by_id["broken"]
    assert len(loaded) == 3


def test_render_flags_losing_cells_with_reference_and_device_time():
    from render_bench_tables import render

    results = [
        # loses to ref 1.68, has device evidence that wins
        _cell("WIDERFACE-L", "bf16", 480, 640, 2.08, ms_device=1.13),
        # wins outright
        _cell("WIDERFACE-L", "bf16", 1080, 1920, 6.76),
    ]
    out = render(results)
    assert "ref 1.68" in out
    assert "device-time WINS" in out
    # the winning cell (same table row, last column) carries no flag
    line = [l for l in out.splitlines() if "6.76" in l][0]
    winning_cell = line.split("|")[-1]
    assert "ref" not in winning_cell and "6.76" in winning_cell
    # sub-3ms cell carries its IQR inline
    assert "±[" in out


def test_render_prints_dash_for_unmeasured_cells():
    from render_bench_tables import render

    results = [
        _cell("WIDERFACE-L", "int8", 1080, 1920, 6.38),
        _cell("WIDERFACE-L", "bf16", 1080, 1920, 6.76),
        _cell("WIDERFACE-L", "bf16", 480, 640, 2.08),
    ]
    out = render(results)
    int8_line = [l for l in out.splitlines()
                 if "6.38" in l][0]
    assert "–" in int8_line  # 480p int8 unmeasured -> dash, not a stale row


def test_update_bench_md_splice_is_idempotent(tmp_path, monkeypatch):
    import update_bench_md as u

    src = ("head\n<!-- X -->\n\nold body\n\n<!-- /X -->\ntail\n")
    once = u._splice(src, "<!-- X -->", "<!-- /X -->", "NEW")
    twice = u._splice(once, "<!-- X -->", "<!-- /X -->", "NEW")
    assert once == twice
    assert "old body" not in once and "NEW" in once
    assert once.startswith("head\n") and once.endswith("tail\n")
    # missing marker / missing data are both no-ops
    assert u._splice("no markers", "<!-- X -->", "<!-- /X -->", "NEW") == "no markers"
    assert u._splice(src, "<!-- X -->", "<!-- /X -->", None) == src


def test_update_bench_md_renderers_handle_campaign_shapes():
    import update_bench_md as u

    campaign = [
        dict(id="attrib-int8-L-1080-input", model="WIDERFACE-L", height=1080,
             stage="input", ms_per_image=0.88),
        dict(id="attrib-int8-L-1080-full", model="WIDERFACE-L", height=1080,
             stage="full", ms_per_image=6.38),
        dict(id="mfu-int8-L-1080", flops=113.8e9, ms_per_image=6.38, mfu=0.045),
        dict(id="int8-quality-L", model="WIDERFACE-L", int8_delta=0.01,
             mAP_50_fp32_engine=0.9, mAP_50_int8_engine=0.89),
        _cell("WIDERFACE-XS", "bf16", 480, 640, 0.9, batch=8),
    ]
    attrib = u.render_attrib(campaign)
    assert "+5.50" in attrib  # full - input delta
    assert "4.5% MFU" in attrib
    quality = u.render_quality(campaign)
    assert "+0.010" in quality
    sweep = [_cell("WIDERFACE-XS", "bf16", 480, 640, 1.41)]
    batch = u.render_batch(campaign, sweep)
    assert "**0.90**" in batch and "1.41" in batch  # batch-1 comparison
    assert "1.23" in batch  # reference XS bf16 480p row
    # empty campaign -> None (sections left as-is)
    assert u.render_attrib([]) is None
    assert u.render_quality([]) is None
    assert u.render_batch([], sweep) is None


def test_render_best_mode_picks_best_across_modes_and_flags_verdicts():
    import update_bench_md as u

    sweep = [
        # 1080p L: int8 batch-1 beats the reference's best (6.83 INT8)
        _cell("WIDERFACE-L", "bf16", 1080, 1920, 6.79),
        _cell("WIDERFACE-L", "int8", 1080, 1920, 6.39),
        # 480p XS: every batch-1 mode loses to ref 1.09 INT8 ...
        _cell("WIDERFACE-XS", "bf16", 480, 640, 1.41, ms_device=0.54),
        # 720p M: loses with no device evidence -> bare LOSS
        _cell("WIDERFACE-M", "bf16", 720, 1280, 3.50),
    ]
    campaign = [
        # ... but the batch-8 cell wins the XS 480p row
        _cell("WIDERFACE-XS", "bf16", 480, 640, 0.41, batch=8),
    ]
    out = u.render_best_mode(campaign, sweep)
    lines = {l.split("|")[1].strip(): l for l in out.splitlines()
             if l.startswith("| ")}
    l1080 = lines["WIDERFACE-L 1920×1080"]
    assert "6.83 (INT8)" in l1080 and "6.39 (int8)" in l1080
    assert "**WIN**" in l1080
    xs = lines["WIDERFACE-XS 640×480"]
    assert "0.41 (bf16 batch-8)" in xs and "**WIN**" in xs
    m = lines["WIDERFACE-M 1280×720"]
    assert "**LOSS**" in m and "device" not in m
    assert "2 wins / 0 parity / 1 losses" in out
    # parity band: within 0.15 ms either way
    sweep2 = [_cell("WIDERFACE-L", "int8", 1080, 1920, 6.90)]
    out2 = u.render_best_mode([], sweep2)
    assert "parity (within jitter)" in out2
    # device-time evidence prints on losing cells when attached
    sweep3 = [_cell("WIDERFACE-XS", "bf16", 480, 640, 1.41, ms_device=0.54)]
    out3 = u.render_best_mode([], sweep3)
    assert "device-only 0.54 ms → device WINS" in out3
    # no measured cells -> None (section left as-is)
    assert u.render_best_mode([], []) is None


def test_render_stream_rows_with_baselines():
    import update_bench_md as u

    campaign = [
        _cell("WIDERFACE-L", "int8", 1080, 1920, 33.9,
              stream_mode="sync", stream_depth=1),
        _cell("WIDERFACE-L", "int8", 1080, 1920, 7.1,
              stream_mode="stream-async", stream_depth=8),
        # re-measure of the same physical cell: later row wins
        _cell("WIDERFACE-L", "int8", 1080, 1920, 7.0,
              stream_mode="stream-async", stream_depth=8),
        # same mode/depth but a packed-output engine: a DISTINCT row
        _cell("WIDERFACE-L", "int8", 1080, 1920, 36.2,
              stream_mode="sync", stream_depth=1,
              engine_kwargs={"pack_output": True}),
    ]
    sweep = [_cell("WIDERFACE-L", "int8", 1080, 1920, 6.40, ms_device=6.79)]
    out = u.render_stream(campaign, sweep)
    assert "**33.90**" in out and "**7.00**" in out and "**7.10**" not in out
    assert "6.40" in out and "6.79" in out  # slope + device baselines
    # sync sorts before stream-async for the same cell
    assert out.index("sync") < out.index("stream-async")
    # the packed-output sync row survives dedup and is labeled
    assert "**36.20**" in out and "sync +pack_output" in out
    assert u.render_stream([], sweep) is None
