"""Out-of-window oracle-parity sweep at an arbitrary scale factor.

The driver hash-checks at sf0.01 only; this tool runs the same
Spark-vs-DuckDB compare at any fixture dir — round 8 ran it at sf0.1 and
caught a real cross-engine drift class the driver could never see
(DuckDB ROUND preserving -0.0, CLAUDE.md alignment rule). DuckDB-side
cost is budgeted per oracle with an interrupt watchdog: a handful of
oracles are DELIBERATELY quadratic/recursive (all-pairs dedup ground
truth, recursive-CTE graph reachability) and are correctness tools for
driver scale, not sf0.1+ — a skip records that explicitly instead of
wedging the sweep.

Usage:
    python tools/parity_sweep.py /root/testdata/sf0.1 [lo] [hi]

Prints one line per query (DONE/SKIP/ERROR + first diff on mismatch) and
a final summary. Run it in index chunks ([lo, hi)) from fresh processes
for long sweeps.
"""

from __future__ import annotations

import sys
import threading
import time

DUCK_BUDGET_S = 150


def main() -> None:
    sf_dir = sys.argv[1]
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 10**9

    sys.path.insert(0, ".")
    import duckdb

    import __spark_entry__ as entry
    from databricks_spark_sql_challenge1_spark.session import get_spark

    spark = get_spark("parity-sweep")
    q, o = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    bad, skipped = [], []
    for name in sorted(o)[lo:hi]:
        t0 = time.monotonic()
        try:
            srows = sorted(
                tuple(str(x) for x in r)
                for r in q[name](spark, sf_dir).collect()
            )
            t1 = time.monotonic()
            timer = threading.Timer(DUCK_BUDGET_S, con.interrupt)
            timer.start()
            try:
                drows = sorted(
                    tuple(str(x) for x in r)
                    for r in con.execute(o[name]).fetchall()
                )
            except duckdb.InterruptException:
                print(
                    f"SKIP {name} spark={t1 - t0:.1f}s rows={len(srows)} "
                    f"(duckdb oracle exceeded {DUCK_BUDGET_S}s — "
                    "deliberately quadratic/recursive oracle; the driver "
                    "checks it at sf0.01)",
                    flush=True,
                )
                skipped.append(name)
                continue
            finally:
                timer.cancel()
            ok = srows == drows
            print(
                f"DONE {name} spark={t1 - t0:.1f}s "
                f"duck={time.monotonic() - t1:.1f}s rows={len(srows)} "
                f"match={ok}",
                flush=True,
            )
            if not ok:
                bad.append(name)
                for a, b in zip(srows, drows):
                    if a != b:
                        print("  first diff:", a[:6], "vs", b[:6], flush=True)
                        break
        except Exception as exc:  # noqa: BLE001 — sweep must keep going
            print(f"ERROR {name}: {str(exc)[:200]}", flush=True)
            bad.append(name)
    print("SWEEPDONE", sf_dir, f"[{lo}:{hi}]", "bad:", bad,
          "skipped:", skipped, flush=True)


if __name__ == "__main__":
    main()
