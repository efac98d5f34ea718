"""Unit tests for bench.py's record building / stream salvage logic.

BENCH_r0N is the driver's scoreboard; the logic that folds streamed
per-stage lines into a headline record (and keeps emitting complete
records as phases land) must not regress. Pure host-side — no TPU, no
jax import (bench.py defers jax imports into the measure functions).
"""
import json

import bench


BASE = dict(bench._CACHED_BASELINE)


def _record(stages=None, fused=None, train=None, note=""):
    return bench._build_record(
        stages or {}, fused or {}, train or {}, BASE, "desc", note=note
    )


def test_empty_record_is_complete_and_unscored():
    r = _record(note="startup")
    assert r["metric"] == "e2e_forecast_fps"
    assert r["value"] == -1.0
    assert r["vs_baseline"] == -1.0
    assert r["note"] == "startup"
    json.dumps(r)  # must be emittable


def test_unscored_record_carries_last_self_measured():
    # A tunnel-outage record must not be a bare -1: the latest
    # driver-verified BENCH_r*.json numbers ride along under
    # ``unverified_``-prefixed keys (no live-record name collisions,
    # advisor r04), while ``value`` stays -1 (only live numbers count).
    r = _record(note="outage")
    assert r["value"] == -1.0
    lsm = r["last_self_measured"]
    assert "NOT measured" in lsm["caveat"]
    assert "source" in lsm
    # every numeric key is prefixed — a scoreboard parser scanning for
    # live names (fused_fps, staged_fps, ...) must not match
    for key in lsm:
        if key not in ("caveat", "source"):
            assert key.startswith("unverified_"), key
    json.dumps(r)


def test_prior_verified_reads_latest_bench_file(tmp_path, monkeypatch):
    # _prior_verified picks the highest-round BENCH_r*.json whose parsed
    # record scored, and skips unscored/corrupt files.
    files = {
        "BENCH_r01.json": {"n": 1, "parsed": {"value": 10.0,
                                              "fused_fps": 10.0}},
        "BENCH_r02.json": {"n": 2, "parsed": {"value": 20.5,
                                              "fused_fps": 20.5,
                                              "staged_fps": 18.0}},
        "BENCH_r03.json": {"n": 3, "parsed": {"value": -1.0}},
    }
    for name, rec in files.items():
        (tmp_path / name).write_text(json.dumps(rec))
    (tmp_path / "BENCH_r04.json").write_text("{corrupt")
    monkeypatch.setattr(bench.os.path, "dirname", lambda p: str(tmp_path))
    out = bench._prior_verified()
    assert out["source"] == "BENCH_r02.json"
    assert out["unverified_fused_fps"] == 20.5
    assert out["unverified_staged_fps"] == 18.0
    assert "unverified_fused_ms" not in out


def test_scored_record_omits_last_self_measured():
    stages = {"pc_stage_ms": 22.0, "bg_ms": 10.0, "fg_ms": 2.5,
              "fusion_ms": 1.5}
    assert "last_self_measured" not in _record(stages=stages)


def test_staged_only_scores_staged_chain():
    stages = {"pc_stage_ms": 22.0, "bg_ms": 10.0, "fg_ms": 2.5,
              "fusion_ms": 1.5, "pc_ms": 21.0}
    r = _record(stages=stages)
    assert r["staged_fps"] == round(1000.0 / 36.0, 3)
    assert r["value"] == r["staged_fps"]
    # combined-canvas pc_ms is reported but NOT part of the staged chain
    assert r["stages_ms"]["pc_ms"] == 21.0
    assert r["vs_baseline"] == round(r["value"] / BASE["e2e_fps"], 2)


def test_fused_beats_staged_for_headline():
    stages = {"pc_stage_ms": 22.0, "bg_ms": 10.0, "fg_ms": 2.5,
              "fusion_ms": 1.5}
    r = _record(stages=stages, fused={"fused_ms": 29.0})
    assert r["fused_fps"] == round(1000.0 / 29.0, 3)
    assert r["value"] == max(r["fused_fps"], r["staged_fps"])


def test_partial_stages_do_not_score():
    r = _record(stages={"pc_stage_ms": 22.0, "bg_ms": 10.0})
    assert "staged_fps" not in r
    assert r["value"] == -1.0


def test_train_keys_ride_along():
    r = _record(train={"bg_train_step_ms": 160.0,
                       "odom_train_step_ms": 1.4})
    assert r["bg_train_step_ms"] == 160.0
    assert r["odom_train_step_ms"] == 1.4


def test_parse_stream_salvages_stage_lines_and_dicts():
    stages, misc = {}, {}
    lines = [
        "garbage not json",
        json.dumps({"stage": "pc_stage_ms", "ms": 22.1}),
        json.dumps({"stage": "bg_ms", "ms": 9.9}),
        json.dumps({"bg_train_step_ms": 159.9, "bg_train_imgs_per_s": 50.0}),
        "1724",  # a bare number line (fused child output) is not a dict
    ]
    bench._parse_stream(lines, stages, misc)
    assert stages == {"pc_stage_ms": 22.1, "bg_ms": 9.9}
    assert misc["bg_train_step_ms"] == 159.9


def _fake_child(code):
    import sys
    return [sys.executable, "-u", "-c", code]


def test_subprocess_streams_and_strips_canary():
    lines = bench._run_tpu_subprocess(
        "--ignored", timeout=20,
        _argv=_fake_child(
            "print('{\"canary\": 1}', flush=True);"
            "print('{\"stage\": \"pc_stage_ms\", \"ms\": 1.0}', flush=True)"
        ),
        _canary_s=10,
    )
    assert lines == ['{"stage": "pc_stage_ms", "ms": 1.0}']


def test_subprocess_kills_silent_wedged_child_fast():
    import time as _t
    t0 = _t.monotonic()
    lines = bench._run_tpu_subprocess(
        "--ignored", timeout=60,
        _argv=_fake_child("import time; time.sleep(120)"),
        _canary_s=2,
    )
    took = _t.monotonic() - t0
    assert lines == []
    assert took < 20, f"wedged child not killed promptly ({took:.1f}s)"


def test_subprocess_salvages_lines_on_deadline_kill():
    lines = bench._run_tpu_subprocess(
        "--ignored", timeout=4,
        _argv=_fake_child(
            "import time;"
            "print('{\"canary\": 1}', flush=True);"
            "print('{\"stage\": \"bg_ms\", \"ms\": 9.6}', flush=True);"
            "time.sleep(120)"
        ),
        _canary_s=10,
    )
    assert lines == ['{"stage": "bg_ms", "ms": 9.6}']


def test_parse_stream_last_value_wins_on_retry():
    stages, misc = {}, {}
    bench._parse_stream(
        [json.dumps({"stage": "pc_stage_ms", "ms": 30.0})], stages, misc
    )
    bench._parse_stream(
        [json.dumps({"stage": "pc_stage_ms", "ms": 22.0})], stages, misc
    )
    assert stages["pc_stage_ms"] == 22.0
