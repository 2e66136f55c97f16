"""Degenerate-warehouse probe: run every oracle-backed query against a
synthesized warehouse where ONE table is empty (the rest sf0.001) and
classify Spark-vs-DuckDB disagreement — the probe-then-fix instrument
behind tests/test_empty_warehouse.py::test_one_table_empty_contract
(round 16; zero new defects across all five high-leverage fixtures, the
four r15-pinned divergence classes each appearing exactly when the
query's own source table is the empty one).

Usage:
    python tools/probe_degenerate.py [table ...]   # default: the five
        high-leverage tables (events documents embeddings orders lineitem)

Prints one summary line per fixture plus each contract violation; the
documented anchor ValueError and oracle agreement both count as clean.
Re-run after adding operators or when the empty-warehouse contract moves.
"""

from __future__ import annotations

import os
import sys
import tempfile

DEFAULT_EMPTY = ["events", "documents", "embeddings", "orders", "lineitem"]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
ANCHOR_MSG = "anchor MAX(o_orderdate)"
BASE = "/root/testdata/sf0.001"


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import duckdb

    import __spark_entry__ as entry
    from databricks_spark_sql_challenge1_spark.session import get_spark

    empty_tables = sys.argv[1:] or DEFAULT_EMPTY
    spark = get_spark("probe-degenerate")
    q, o = entry.queries(), entry.oracle_sql()
    any_bad = False
    for empty_t in empty_tables:
        d = tempfile.mkdtemp(prefix=f"onetable_empty_{empty_t}_")
        con = duckdb.connect()
        for t in TABLES:
            limit = "LIMIT 0" if t == empty_t else ""
            con.execute(
                f"COPY (SELECT * FROM '{BASE}/{t}.parquet' {limit}) "
                f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
            )
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'"
            )
        bad, anchored = [], []
        for name in sorted(o):
            try:
                srows = sorted(
                    tuple(str(x) for x in r) for r in q[name](spark, d).collect()
                )
            except ValueError as exc:
                if ANCHOR_MSG in str(exc):
                    anchored.append(name)
                    continue
                bad.append((name, f"spark-ValueError: {str(exc)[:110]}"))
                continue
            except Exception as exc:  # noqa: BLE001 — a probe collects everything
                bad.append((name, f"spark-err: {type(exc).__name__}: {str(exc)[:110]}"))
                continue
            try:
                drows = sorted(
                    tuple(str(x) for x in r)
                    for r in con.execute(o[name]).fetchall()
                )
            except Exception as exc:  # noqa: BLE001
                bad.append((name, f"duck-err: {type(exc).__name__}: {str(exc)[:110]}"))
                continue
            if srows != drows:
                first = next(
                    (f"{a[:4]} vs {b[:4]}" for a, b in zip(srows, drows) if a != b),
                    f"row counts {len(srows)} vs {len(drows)}",
                )
                bad.append((name, f"diff: {first}"))
        con.close()
        print(f"=== empty {empty_t}: {len(bad)} divergent, {len(anchored)} anchored")
        for n, msg in bad:
            print("  ", n, "|", msg)
        any_bad = any_bad or bool(bad)
        sys.stdout.flush()
    print("PROBEDONE (divergent rows include the PINNED out-of-contract "
          "classes — check them against tests/test_empty_warehouse.py "
          "before treating any as a defect)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
