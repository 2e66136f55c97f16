"""The driver verifies only the first 50 entries of ``queries()`` — pin the
window contents (see registry.DRIVER_PRIORITY)."""

from __future__ import annotations

import databricks_spark_sql_challenge1_spark.operators  # noqa: F401
from databricks_spark_sql_challenge1_spark.registry import (
    DRIVER_PRIORITY,
    ORACLES,
    QUERIES,
    ordered_oracles,
    ordered_queries,
)

DRIVER_WINDOW = 50

# Round-8 must-verify: everything new or whose code/oracle changed this
# round (streaming parity family, JPEG codec, integer-cents gapfills,
# guarded fixed-band baselines, hardened GIF decoder), the last round-4
# row, and the committed widget/calendar_dim r5 backlog (VERDICT r7 #3).
MUST_VERIFY = {
    # new or changed this round
    "streaming_parity_tumbling_1h",
    "streaming_parity_session_30m",
    "streaming_parity_dedup",
    "streaming_parity_user_state",
    "streaming_parity_click_attribution",
    "streaming_parity_nation_activity",
    "multimodal_jpeg_roundtrip",
    "events_gapfill_stats",
    "events_gapfill_interp",
    "dedup_simhash_wide_pairs",
    "dedup_embedding_lsh",
    "multimodal_gif_roundtrip",
    "streaming_parity_gap_monitor",
    "streaming_parity_incremental_dedup",
    # the last round-4 row (ADVICE r7 made this mandatory)
    "streaming_nation_activity",
    # the committed r5 backlog head
    "widget_month_orders",
    "widget_month_items",
    "widget_month_totals",
    "widget_month_value_orders",
    "widget_month_value_items",
    "widget_day_orders",
    "widget_day_items",
    "widget_day_peak",
    "widget_day_value_orders",
    "widget_day_value_items",
    "calendar_dim",
}


def test_priority_names_are_registered_and_unique():
    assert len(DRIVER_PRIORITY) == len(set(DRIVER_PRIORITY))
    missing = [n for n in DRIVER_PRIORITY if n not in QUERIES]
    assert not missing, missing


def test_ordering_drops_nothing():
    assert set(ordered_queries()) == set(QUERIES)
    assert set(ordered_oracles()) == set(ORACLES)


def test_must_verify_set_inside_driver_window():
    window = list(ordered_queries())[:DRIVER_WINDOW]
    outside = MUST_VERIFY - set(window)
    assert not outside, f"need driver rows but ordered past {DRIVER_WINDOW}: {outside}"


def test_boundary_comment_matches_actual_window():
    """The '--- window boundary ---' comment in registry.py must sit after
    exactly the names that form the driver's first-50 window (caught an
    off-by-one in round 5)."""
    import re

    import databricks_spark_sql_challenge1_spark.registry as reg

    src = open(reg.__file__).read()
    before = re.findall(
        r'^\s+"([a-z0-9_]+)",', src.split("window boundary")[0], re.M
    )
    assert before == ordered_queries_names()[:DRIVER_WINDOW]


def ordered_queries_names():
    return list(ordered_queries())


def test_no_evidence_older_than_two_rounds():
    """ADVICE r7: assert a maximum evidence age so the rotation invariant
    can't silently slip. Every registered query whose latest CORRECTNESS
    row is two or more rounds old (or which has never had one, except
    queries new THIS round) must be inside the upcoming driver window —
    with a bounded allowance for deliberately parked names documented in
    registry.py."""
    import glob
    import json
    import os

    latest = {}
    max_round = 0
    for f in sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(f)[13:15])
        max_round = max(max_round, rnd)
        for name in json.load(open(f)):
            latest[name] = rnd
    if not latest:
        return  # fresh clone without driver artifacts
    window = set(list(ordered_queries())[:DRIVER_WINDOW])
    # names whose evidence would be MORE than two rounds old after the
    # upcoming driver run (latest <= max_round - 2) that the window does
    # not refresh
    stale_unrefreshed = sorted(
        n
        for n in QUERIES
        if latest.get(n, max_round) <= max_round - 2 and n not in window
    )
    # documented parking allowance: at most four rows-only queries may ride
    # one extra round (see registry.py's window comment — r8 parks the
    # approx_* sketch pair plus two streaming/library rows-only whose
    # semantics are hash-checked via stronger stand-ins in the window)
    assert len(stale_unrefreshed) <= 4, stale_unrefreshed
    for n in stale_unrefreshed:
        assert n not in ORACLES, (
            f"{n} is oracle-backed and stale but outside the window"
        )
