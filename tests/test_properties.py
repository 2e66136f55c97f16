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


# --- distributed connected components vs pure-Python union-find ------------


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id in component
    labels = {}
    for v in range(n_nodes):
        r = find(v)
        labels.setdefault(r, []).append(v)
    return {v: min(vs) for r, vs in labels.items() for v in vs}


@given(
    graph=st.integers(min_value=1, max_value=24).flatmap(
        lambda n: st.tuples(
            st.just(n),
            st.lists(
                st.tuples(
                    st.integers(min_value=0, max_value=n - 1),
                    st.integers(min_value=0, max_value=n - 1),
                ),
                max_size=40,
            ),
        )
    )
)
@settings(max_examples=8, deadline=None)
def test_connected_components_matches_union_find(spark, graph):
    """The logarithmic-round label propagation must compute exactly the
    min-id component labels a sequential union-find computes, on arbitrary
    graphs (self-loops, duplicates, disconnected nodes included)."""
    from databricks_spark_sql_challenge1_spark.operators.clustering import (
        connected_components,
    )

    n, edges = graph
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = (
        spark.createDataFrame(list(edges), "doc_1 long, doc_2 long")
        if edges
        else spark.createDataFrame([], "doc_1 long, doc_2 long")
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(nodes, pairs).collect()
    }
    assert got == _union_find(n, edges)
