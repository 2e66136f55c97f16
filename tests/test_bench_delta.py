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


def test_delta_adjudication_classes_contention_vs_code(tmp_path):
    """Round 9 (VERDICT r8 #3): a slower flag whose fresh-subprocess
    re-measure is back within the band is classed contention; one that
    stays slow is classed a real code regression — no manual re-measure."""
    notes = _notes(tmp_path)
    prev = _detail({"cont": 2.0, "real": 2.0}, 0.5)
    now = _detail({"cont": 5.0, "real": 5.0}, 0.5)
    now["isolated"] = {"cont": 2.1, "real": 4.8}  # vs prev 2.0 each
    bench._write_delta_table(now, prev, notes)
    s = open(notes).read()
    cont_row = [ln for ln in s.splitlines() if ln.startswith("| cont |")][0]
    real_row = [ln for ln in s.splitlines() if ln.startswith("| real |")][0]
    assert "contention (in-sweep)" in cont_row and "2.100" in cont_row
    assert "slower (code" in real_row and "4.800" in real_row


def test_delta_advisory_classing_on_oversubscribed_host(tmp_path):
    """Round 17 (VERDICT r16 #4): when the sweep's own multicore probe shows
    inflation past _INFLATION_ADVISORY_MAX, an in-run isolated re-measure
    cannot indict code — a still-slow row is classed 'needs idle
    adjudication' and the table emits the exact --anchors command; a
    back-in-band isolated row still closes as contention (a degraded host
    only inflates the isolated number, so in-band is conservative)."""
    notes = _notes(tmp_path)
    prev = _detail({"cont": 2.0, "susp": 2.0, "uncapped": 2.0}, 0.5)
    now = _detail({"cont": 5.0, "susp": 5.0, "uncapped": 5.0}, 0.5)
    now["calibration_mt"] = {"inflation": 1.98}
    now["isolated"] = {"cont": 2.1, "susp": 4.8}  # uncapped: past the cap
    bench._write_delta_table(now, prev, notes)
    s = open(notes).read()
    cont_row = [ln for ln in s.splitlines() if ln.startswith("| cont |")][0]
    susp_row = [ln for ln in s.splitlines() if ln.startswith("| susp |")][0]
    assert "contention (in-sweep)" in cont_row
    assert "needs idle adjudication" in susp_row and "slower (code" not in susp_row
    assert "2.40x in-run isolated, advisory at inflation 1.98" in susp_row
    assert "ADVISORY-ONLY" in s
    # the emitted command carries the FULL union (ADVICE r17): the
    # adjudication names plus this sweep's >= ANCHOR_MIN_SEC tail (cont at
    # 5.0 s), never just the flagged rows — an explicit-name --anchors run
    # replaces BENCH_ANCHORS.json wholesale
    assert "`python bench.py --anchors cont susp uncapped`" in s
    assert "adjudication names alone: susp uncapped" in s
    assert "REPLACES BENCH_ANCHORS.json wholesale" in s


def test_delta_advisory_takes_worst_of_start_and_post_stamps(tmp_path):
    """The r17 builder attempt passed the start-of-sweep stamp (1.59) but
    the host degraded by adjudication time — the advisory decision must
    take the WORST of the sweep-start and adjudication-time probes."""
    notes = _notes(tmp_path)
    prev = _detail({"susp": 2.0}, 0.5)
    now = _detail({"susp": 5.0}, 0.5)
    now["calibration_mt"] = {"inflation": 1.59}       # under threshold
    now["calibration_mt_post"] = {"inflation": 1.91}  # degraded since
    now["isolated"] = {"susp": 4.8}
    bench._write_delta_table(now, prev, notes)
    s = open(notes).read()
    susp_row = [ln for ln in s.splitlines() if ln.startswith("| susp |")][0]
    assert "needs idle adjudication" in susp_row and "slower (code" not in susp_row
    assert "advisory at inflation 1.91" in susp_row
    assert "1.59 at sweep start, 1.91 at adjudication time" in s


def test_delta_code_classing_unchanged_on_healthy_host(tmp_path):
    """Below the inflation threshold the r9 classing is untouched — a
    still-slow isolated row IS a code indictment (regression guard for the
    r17 advisory change)."""
    notes = _notes(tmp_path)
    prev = _detail({"real": 2.0}, 0.5)
    now = _detail({"real": 5.0}, 0.5)
    now["calibration_mt"] = {"inflation": 1.2}
    now["isolated"] = {"real": 4.8}
    bench._write_delta_table(now, prev, notes)
    s = open(notes).read()
    real_row = [ln for ln in s.splitlines() if ln.startswith("| real |")][0]
    assert "slower (code, 2.40x isolated)" in real_row
    assert "ADVISORY-ONLY" not in s


def test_delta_slower_denominator_uses_inflation_ratio(tmp_path):
    """Round 18 (VERDICT r17 #4), with the r17 driver sweep's own stamps as
    the fixture: single-thread stamp FASTER (calibration 0.801→0.588, host
    ratio 0.73) while parallel capacity got WORSE (inflation 1.5→1.91 at
    start, 2.02 at adjudication). Under the old host-only denominator a
    parallel-heavy row at raw 1.10x read "1.50x normalized" and was
    flagged — the manufactured r17 flag pile. The slower test must now
    clear the band under max(host, inflation-ratio) = 2.02/1.5 ≈ 1.35, so
    raw 1.10x (dedup_embedding_clusters 14.966→16.533) is within noise,
    while a genuinely-2x row still flags."""
    notes = _notes(tmp_path)
    prev = _detail({"par_heavy": 14.966, "genuine": 5.0}, 0.801)
    prev["calibration_mt"] = {"inflation": 1.5}
    now = _detail({"par_heavy": 16.533, "genuine": 10.0}, 0.588)
    now["calibration_mt"] = {"inflation": 1.91}
    now["calibration_mt_post"] = {"inflation": 2.02}
    bench._write_delta_table(now, prev, notes)
    s = open(notes).read()
    assert "| par_heavy |" not in s  # raw 1.10x: host-manufactured, not code
    genuine_row = [ln for ln in s.splitlines() if ln.startswith("| genuine |")][0]
    assert "slower" in genuine_row  # raw 2.0x clears even the 1.35 denominator
    assert "max(host ratio, inflation ratio 1.35)" in s


def test_delta_faster_denominator_is_conservative_too(tmp_path):
    """The symmetric direction: when parallel capacity IMPROVED (inflation
    ratio < 1 < host ratio), a parallel-heavy row's raw speedup is the
    host, not code — the faster flag must clear the band under
    min(host, inflation-ratio)."""
    notes = _notes(tmp_path)
    prev = _detail({"par_fast": 10.0}, 0.5)
    prev["calibration_mt"] = {"inflation": 2.0}
    now = _detail({"par_fast": 6.0}, 0.5)  # host ratio 1.0, raw 0.60x
    now["calibration_mt"] = {"inflation": 1.4}  # inflation ratio 0.7
    bench._write_delta_table(now, prev, notes)
    s = open(notes).read()
    # 0.60 / min(1.0, 0.7) = 0.857 — within the band, not "faster (code?)"
    assert "| par_fast |" not in s


def test_delta_advisory_takes_worst_including_final_stamp(tmp_path):
    """ADVICE r17 #2: host degradation that begins DURING the re-measure
    pass evades both the sweep-start and adjudication-time stamps — the
    post-adjudication calibration_mt_final probe must also feed the
    worst-of-stamps advisory decision."""
    notes = _notes(tmp_path)
    prev = _detail({"susp": 2.0}, 0.5)
    prev["calibration_mt"] = {"inflation": 1.2}
    now = _detail({"susp": 5.0}, 0.5)
    now["calibration_mt"] = {"inflation": 1.2}        # healthy at start
    now["calibration_mt_post"] = {"inflation": 1.3}   # healthy pre-re-measure
    now["calibration_mt_final"] = {"inflation": 1.95}  # degraded during it
    now["isolated"] = {"susp": 4.8}
    bench._write_delta_table(now, prev, notes)
    s = open(notes).read()
    susp_row = [ln for ln in s.splitlines() if ln.startswith("| susp |")][0]
    assert "needs idle adjudication" in susp_row and "slower (code" not in susp_row
    assert "advisory at inflation 1.95" in susp_row
    assert "1.95 after the re-measure pass" in s


def test_delta_union_command_includes_current_anchor_file(tmp_path):
    """ADVICE r17 #1: the emitted --anchors command must union in every
    name already in BENCH_ANCHORS.json (next to the notes file), since an
    explicit-name run replaces the file wholesale."""
    import json as _json

    notes = _notes(tmp_path)
    (tmp_path / "BENCH_ANCHORS.json").write_text(
        _json.dumps({"anchors": {bench.CALIBRATION_QUERY: 0.6,
                                 "committed_anchor": 4.2}})
    )
    prev = _detail({"susp": 2.0}, 0.5)
    now = _detail({"susp": 5.0}, 0.5)  # no isolated -> slower (unadjudicated)
    bench._write_delta_table(now, prev, notes)
    s = open(notes).read()
    # union = needs_idle {susp} + anchor file {committed_anchor} + >=3s tail
    # {susp}; the calibration probe is dropped (always auto-prepended)
    assert "`python bench.py --anchors committed_anchor susp`" in s
    assert bench.CALIBRATION_QUERY not in s.split("--anchors ")[1].split("`")[0]


def test_adjudicate_flags_only_remeasures_slower(monkeypatch):
    calls = []
    monkeypatch.setattr(
        bench, "_isolated_median", lambda name: calls.append(name) or 1.0
    )
    prev = _detail({"slow": 2.0, "fast": 2.0, "same": 2.0}, 0.5)
    now = _detail({"slow": 5.0, "fast": 0.5, "same": 2.0}, 0.5)
    out = bench._adjudicate_flags(now, prev)
    assert calls == ["slow"]
    assert out == {"slow": 1.0}
    assert bench._adjudicate_flags(now, None) == {}


def test_delta_degrades_gracefully(tmp_path):
    notes = _notes(tmp_path)
    # no previous detail / no calibration: no write, no crash
    bench._write_delta_table(_detail({"a": 1.0}, 0.5), None, notes)
    bench._write_delta_table(
        _detail({"a": 1.0}, 0.5), {"queries": {"a": 1.0}}, notes
    )
    assert bench._DELTA_BEGIN not in open(notes).read()


def test_anchor_names_selects_tail_and_leads_with_calibration():
    """--anchors default set: the >= ANCHOR_MIN_SEC tail of the last
    sweep, sorted, always led by the calibration probe exactly once —
    explicit names keep their order behind the probe."""
    picked = bench._anchor_names(
        {"heavy_b": 4.0, "heavy_a": 3.0, "light": 2.9,
         bench.CALIBRATION_QUERY: 5.0}
    )
    assert picked == [bench.CALIBRATION_QUERY, "heavy_a", "heavy_b"]
    assert bench._anchor_names({}) == [bench.CALIBRATION_QUERY]
    assert bench._anchor_names({}, explicit=["x", bench.CALIBRATION_QUERY]) \
        == [bench.CALIBRATION_QUERY, "x"]
    # repeated explicit names run the median-of-3 protocol once, not twice
    assert bench._anchor_names({}, explicit=["x", "x"]) \
        == [bench.CALIBRATION_QUERY, "x"]


def test_carry_failed_anchors_merges_previous_medians():
    """VERDICT r15 #5 / ADVICE (b): a partial --anchors failure must carry
    the previous file's good medians forward instead of clobbering them
    with None — and must NOT invent a value for a name the previous file
    never measured (or itself failed)."""
    anchors = {"ok": 1.5, "crashed": None, "never_seen": None, "prev_null": None}
    prev = {"crashed": 3.2, "ok": 9.9, "prev_null": None}
    carried = bench._carry_failed_anchors(
        anchors, ["crashed", "never_seen", "prev_null"], prev
    )
    assert carried == ["crashed"]
    assert anchors["crashed"] == 3.2      # merged from previous file
    assert anchors["ok"] == 1.5           # this run's good value untouched
    assert anchors["never_seen"] is None  # visibly failed, not invented
    assert anchors["prev_null"] is None   # a previous failure carries nothing
