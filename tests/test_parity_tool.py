"""Pin tools/parity_names.py's top-level ORDER BY detector (ADVICE r10 /
r11 code review): the order-sensitive compare must engage exactly when the
oracle declares an OUTPUT order — an ``ORDER BY`` at paren depth 0 — and
must NOT be tripped by ORDER BY inside ``OVER (...)`` windows or CTE
subqueries, which say nothing about output order."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.parity_names import has_top_level_order_by


def test_detects_terminal_order_by():
    assert has_top_level_order_by("SELECT * FROM t ORDER BY a")
    assert has_top_level_order_by("select * from t order by a nulls last")
    assert has_top_level_order_by(
        "SELECT sum(x) FROM t GROUP BY z ORDER BY z LIMIT 5"
    )


def test_ignores_window_and_subquery_order_by():
    assert not has_top_level_order_by(
        "SELECT row_number() OVER (ORDER BY a) AS r FROM t"
    )
    assert not has_top_level_order_by(
        "WITH c AS (SELECT * FROM t ORDER BY a LIMIT 5) SELECT * FROM c"
    )
    assert not has_top_level_order_by("SELECT * FROM t")


def test_cte_plus_terminal_order_by():
    assert has_top_level_order_by(
        "WITH c AS (SELECT * FROM t ORDER BY a LIMIT 5) "
        "SELECT * FROM c ORDER BY b"
    )


def test_every_registered_oracle_classification_is_stable():
    # Today no registered oracle has ORDER BY solely inside a
    # subexpression; if one appears, this test documents that the parity
    # tool will treat it as unordered (multiset compare) by design.
    import databricks_spark_sql_challenge1_spark.operators  # noqa: F401
    from __spark_entry__ import oracle_sql

    oracles = oracle_sql()
    assert len(oracles) > 100
    flips = [
        n
        for n, s in oracles.items()
        if "order by" in s.lower() and not has_top_level_order_by(s)
    ]
    assert flips == []
