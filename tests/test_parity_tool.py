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


def test_skips_string_literals_and_comments():
    # ADVICE r11: literals/comments must not corrupt the depth scan or
    # produce a phantom ORDER BY match.
    assert not has_top_level_order_by("SELECT ' order by x' AS s FROM t")
    assert not has_top_level_order_by("SELECT * FROM t -- order by a\n")
    # unbalanced paren inside a literal must not hide a real ORDER BY ...
    assert has_top_level_order_by("SELECT '(' AS s FROM t ORDER BY s")
    assert has_top_level_order_by("SELECT ')' AS s FROM t ORDER BY s")
    # ... nor inside a comment
    assert has_top_level_order_by(
        "SELECT x -- weird (\nFROM t ORDER BY x"
    )
    # '' escape stays inside the literal
    assert not has_top_level_order_by(
        "SELECT 'it''s ( order by' AS s FROM t"
    )
    assert has_top_level_order_by(
        "SELECT 'it''s )' AS s FROM t ORDER BY s"
    )


def _reference_classifier(sql: str) -> bool:
    """Independent literal/comment-aware reference: strip quoted literals
    ('' escapes included) and -- comments with regexes, then depth-scan."""
    import re

    stripped = re.sub(r"'(?:[^']|'')*'", "''", sql)
    stripped = re.sub(r"--[^\n]*", "", stripped)
    depth = 0
    for i, ch in enumerate(stripped.lower()):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and stripped.lower().startswith("order by", i):
            return True
    return False


def test_every_registered_oracle_classification_is_stable():
    # Both directions (ADVICE r11): the tool's classifier must agree with
    # the independent literal/comment-aware reference parser on EVERY
    # registered oracle — a disagreement either suppresses the
    # order-sensitive compare (missed detection) or raises a spurious
    # ORDER-ONLY failure (false positive).
    import databricks_spark_sql_challenge1_spark.operators  # noqa: F401
    from __spark_entry__ import oracle_sql

    oracles = oracle_sql()
    assert len(oracles) > 100
    disagree = [
        n
        for n, s in oracles.items()
        if has_top_level_order_by(s) != _reference_classifier(s)
    ]
    assert disagree == []
    # The safety rule the old "every ORDER BY is top-level" pin stood in
    # for (CLAUDE.md alignment rules): an oracle whose compare is
    # order-INsensitive (no top-level ORDER BY) must not carry a
    # top-level LIMIT — LIMIT without a total order is non-deterministic
    # across engines. Nested-only ORDER BY with no LIMIT is fine: the
    # driver hash is order-insensitive, so a top-level sort would be a
    # single-partition stage bought for nothing.
    import re

    def _top_level_limit(sql: str) -> bool:
        stripped = re.sub(r"'(?:[^']|'')*'", "''", sql)
        stripped = re.sub(r"--[^\n]*", "", stripped).lower()
        depth = 0
        for i, ch in enumerate(stripped):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif (
                depth == 0
                and stripped.startswith("limit", i)
                and (i == 0 or not stripped[i - 1].isalnum())
                and stripped[i - 1 : i] != "_"
                and (
                    i + 5 >= len(stripped)
                    or not (stripped[i + 5].isalnum() or stripped[i + 5] == "_")
                )
            ):
                return True
        return False

    unsafe = [
        n
        for n, s in oracles.items()
        if _top_level_limit(s) and not has_top_level_order_by(s)
    ]
    assert unsafe == []
    # and pin the (small) set of oracles that rely on order-insensitive
    # compare while still mentioning nested ORDER BYs, so a new one is a
    # conscious decision, not an accident:
    nested_only = sorted(
        n
        for n, s in oracles.items()
        if "order by" in s.lower() and not has_top_level_order_by(s)
    )
    assert nested_only == ["dedup_simhash_methods"]


def test_no_oracle_uses_the_classifiers_blind_spots():
    # ADVICE r12: the tool AND the reference classifier share two blind
    # spots — /* */ block comments and double-quoted identifiers (which
    # could smuggle quotes/parens past the depth scan). The agreement test
    # above cannot catch them, so pin that no registered oracle uses
    # either construct; if one ever legitimately needs them, extend BOTH
    # classifiers first.
    import databricks_spark_sql_challenge1_spark.operators  # noqa: F401
    from __spark_entry__ import oracle_sql

    offenders = [
        n for n, s in oracle_sql().items() if "/*" in s or '"' in s
    ]
    assert offenders == []
