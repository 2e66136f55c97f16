"""The bench delta-table writer runs inside the driver's per-round bench
invocation — a crash there would lose the round's BENCH artifact, so its
behavior is pinned here on synthetic sweeps (no Spark needed)."""

from __future__ import annotations

import bench


def _notes(tmp_path, body="# notes\n\nhand-written prose.\n"):
    p = tmp_path / "BENCH_NOTES.md"
    p.write_text(body)
    return str(p)


def _detail(queries, calib, sink="collect"):
    return {
        "queries": queries,
        "calibration": {"median_sec": calib},
        "sink": sink,
    }


def test_delta_flags_only_normalized_and_absolute(tmp_path):
    notes = _notes(tmp_path)
    prev = _detail({"a": 1.0, "b": 2.0, "tiny": 0.2}, 0.5)
    # host ratio 1.0; b regresses 2x with a 2 s absolute delta -> flagged;
    # tiny regresses 2x but only 0.2 s absolute -> suppressed
    now = _detail({"a": 1.0, "b": 4.0, "tiny": 0.4, "new_q": 0.3}, 0.5)
    bench._write_delta_table(now, prev, notes)
    s = open(notes).read()
    assert s.count(bench._DELTA_BEGIN) == 1
    assert "| b |" in s and "slower" in s
    assert "| tiny |" not in s
    assert "| new_q |" in s and "| new |" not in s.split("| new_q |")[0]
    assert "hand-written prose." in s  # surrounding text untouched


def test_delta_normalizes_by_host_ratio(tmp_path):
    notes = _notes(tmp_path)
    prev = _detail({"a": 2.0}, 0.5)
    # raw 2x regression on a host that is exactly 2x slower -> within noise
    now = _detail({"a": 4.0}, 1.0)
    bench._write_delta_table(now, prev, notes)
    s = open(notes).read()
    assert "none flagged" in s


def test_delta_rewrite_is_idempotent(tmp_path):
    notes = _notes(tmp_path)
    prev = _detail({"a": 1.0}, 0.5)
    now = _detail({"a": 3.0}, 0.5)
    bench._write_delta_table(now, prev, notes)
    bench._write_delta_table(now, prev, notes)
    s = open(notes).read()
    assert s.count(bench._DELTA_BEGIN) == 1
    assert s.count(bench._DELTA_END) == 1


def test_delta_degrades_gracefully(tmp_path):
    notes = _notes(tmp_path)
    # no previous detail / no calibration: no write, no crash
    bench._write_delta_table(_detail({"a": 1.0}, 0.5), None, notes)
    bench._write_delta_table(
        _detail({"a": 1.0}, 0.5), {"queries": {"a": 1.0}}, notes
    )
    assert bench._DELTA_BEGIN not in open(notes).read()
