"""Property-based tests (hypothesis) for the pure helper functions the
anchored queries depend on."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from databricks_spark_sql_challenge1_spark.functions.datetime import (
    date_literal,
    month_start,
    shift_months,
)

ts_strategy = st.datetimes(
    min_value=dt.datetime(1990, 1, 1), max_value=dt.datetime(2100, 12, 31)
)


@given(ts_strategy, st.integers(min_value=-600, max_value=600))
@settings(max_examples=200)
def test_shift_months_roundtrip(ts, n):
    y, m = shift_months(ts, n)
    y2, m2 = shift_months(dt.datetime(y, m, 1), -n)
    assert (y2, m2) == (ts.year, ts.month)


@given(ts_strategy, st.integers(min_value=-600, max_value=600))
@settings(max_examples=200)
def test_shift_months_valid_month(ts, n):
    y, m = shift_months(ts, n)
    assert 1 <= m <= 12
    # total month delta is exactly n
    assert (y * 12 + m) - (ts.year * 12 + ts.month) == n


@given(ts_strategy)
def test_month_start_is_first_day(ts):
    y, m = ts.year, ts.month
    d = month_start(y, m)
    assert d.day == 1 and d.year == y and d.month == m


@given(ts_strategy)
def test_date_literal_formats(ts):
    assert len(date_literal(ts.date())) == 10
    assert len(date_literal(ts)) == 19
