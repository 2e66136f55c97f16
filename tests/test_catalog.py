"""Guards against parquet-decode drift for the events fixture.

``events.parquet`` is TIMESTAMP(NANOS); how Spark decodes it has already
changed once under us (nanosAsLong-honored ``bigint`` on Spark ≤4.0 →
``timestamp_ntz`` on 4.1+, which ignores the legacy conf). ``catalog.
load_table`` must normalize every decoding to a plain ``timestamp`` —
these tests fail loudly on the next drift instead of erroring 20 queries
deep in a driver run.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from databricks_spark_sql_challenge1_spark import catalog
from databricks_spark_sql_challenge1_spark.catalog import load_table
from tests.conftest import SF_DIR


def test_events_ts_is_timestamp(spark):
    """Whatever the parquet decodes to (bigint / ntz / tz), load_table must
    hand out a plain TIMESTAMP ts — unix_micros, watermarks, and long casts
    all require it."""
    df = load_table(spark, SF_DIR, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    # and it must be usable by the functions that broke in round 3
    row = df.select(
        F.unix_micros("ts").alias("us"),
        F.col("ts").cast("long").alias("es"),
    ).first()
    assert row["us"] == row["es"] * 1_000_000 + (row["us"] % 1_000_000)


def test_events_ts_values_match_duckdb_truncation(spark, duck):
    """The healed ts must equal DuckDB's ns→us view of the same parquet
    (UTC, microsecond truncation) — this pins the *values*, not just the
    dtype, so a wrong-timezone cast can't sneak through."""
    got = (
        load_table(spark, SF_DIR, "events")
        .orderBy("event_id")
        .select("event_id", "ts")
        .limit(5)
        .collect()
    )
    want = duck.execute(
        "SELECT event_id, CAST(ts AS TIMESTAMP) AS ts "
        "FROM events ORDER BY event_id LIMIT 5"
    ).fetchall()
    for g, w in zip(got, want):
        assert g["event_id"] == w[0]
        g_ts = g["ts"].replace(tzinfo=None) if g["ts"].tzinfo else g["ts"]
        w_ts = w[1].replace(tzinfo=None) if w[1].tzinfo else w[1]
        assert abs((g_ts - w_ts).total_seconds()) < 1e-6, (g_ts, w_ts)


def test_heal_is_identity_on_proper_timestamp(spark):
    """_heal_events_ts must be a no-op when ts is already TIMESTAMP."""
    df = spark.createDataFrame(
        [(1, dt.datetime(2001, 8, 1, 12, 0, 0))], "event_id long, ts timestamp"
    )
    healed = catalog._heal_events_ts(df)
    assert dict(healed.dtypes)["ts"] == "timestamp"
    assert healed.first()["ts"] == dt.datetime(2001, 8, 1, 12, 0, 0)


def test_heal_casts_ntz(spark):
    """timestamp_ntz wall-clock must reinterpret as the same UTC instant."""
    df = spark.createDataFrame(
        [(1, dt.datetime(2001, 8, 1, 12, 0, 0))],
        "event_id long, ts timestamp_ntz",
    )
    healed = catalog._heal_events_ts(df)
    assert dict(healed.dtypes)["ts"] == "timestamp"
    assert healed.select(F.unix_micros("ts").alias("us")).first()["us"] == int(
        dt.datetime(2001, 8, 1, 12, 0, 0, tzinfo=dt.timezone.utc).timestamp()
        * 1_000_000
    )


def test_empty_orders_anchor_fails_loudly(spark, tmp_path):
    """MAX(o_orderdate) over an empty orders table is NULL; caching it
    would splice the literal string "None" into every anchored trend
    query (a baffling downstream AnalysisException). The anchor pull must
    raise a clear ValueError at the source instead — and must NOT poison
    the per-sf_dir cache with the None."""
    import duckdb
    import pytest

    d = str(tmp_path)
    duckdb.connect().execute(
        f"COPY (SELECT * FROM '/root/testdata/sf0.001/orders.parquet' "
        f"LIMIT 0) TO '{d}/orders.parquet' (FORMAT PARQUET)"
    )
    with pytest.raises(ValueError, match="anchor MAX\\(o_orderdate\\)"):
        catalog.last_order_datetime(spark, d)
    assert d not in catalog._ANCHOR_CACHE
