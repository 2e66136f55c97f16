"""Growth-curve sweep: time registered queries across stress-fixture scales.

Formalizes the protocol SCALE.md's curves were measured with (rounds 4-6
ran it ad-hoc): for each (query, scale_dir) cell, one discarded warm-up
run then median of REPEATS timed runs, materialized through
``bench.materialize`` so the sink is explicit — ``parquet`` for
multi-million-row outputs keeps the curve measuring the PLAN, not driver
transfer (SCALE.md round-6 addendum 3's known artifact).

Usage:
    python tools/growth_sweep.py --queries dedup_embedding_clusters \
        --dirs /root/testdata/sf0.1 /tmp/stress_4x /tmp/stress_8x \
        [--sink collect|count|parquet] [--repeats 3]

Prints one JSON line per (query, dir) cell as it lands (crash-safe), then
a final summary object keyed by query with per-dir medians.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", nargs="+", required=True)
    ap.add_argument("--dirs", nargs="+", required=True)
    ap.add_argument("--sink", default="collect")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from bench import materialize
    from databricks_spark_sql_challenge1_spark.session import get_spark
    import databricks_spark_sql_challenge1_spark.operators  # noqa: F401
    from databricks_spark_sql_challenge1_spark import registry
    from databricks_spark_sql_challenge1_spark import catalog

    spark = get_spark()
    summary: dict[str, dict[str, float]] = {}
    for name in args.queries:
        fn = registry.QUERIES[name]
        summary[name] = {}
        for d in args.dirs:
            # Decorrelated replicas share dim tables but not anchors; the
            # per-sf anchor cache in catalog handles per-dir isolation.
            materialize(fn(spark, d), args.sink)  # warm-up, discarded
            times = []
            for _ in range(args.repeats):
                t0 = time.monotonic()
                materialize(fn(spark, d), args.sink)
                times.append(time.monotonic() - t0)
            med = statistics.median(times)
            cell = {
                "query": name,
                "dir": d,
                "median_s": round(med, 2),
                "runs": [round(t, 2) for t in times],
                "sink": args.sink,
            }
            print(json.dumps(cell), flush=True)
            summary[name][d] = round(med, 2)
    print(json.dumps({"summary": summary}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
