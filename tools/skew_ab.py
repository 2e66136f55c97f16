"""Skew-join A/B: a manufactured hot key, AQE skew-split ON vs OFF.

Completes the scale-lever trilogy (bucketed layout A/B, partition-pruning
A/B, and now skew) with measured evidence instead of the SCALE.md prose
argument: a deliberately skewed shuffled join — 30% of the probe side
remapped onto ONE join key — timed with the skew-split lever on and off,
same plan otherwise, row-identical results asserted.

Workload: lineitem (probe, skewed) ⋈ orders (build) on the remapped key,
then a global aggregate so the result is one row (identical under both
configs; any divergence fails the run). Broadcast is disabled so the join
is a genuine shuffled sort-merge join, the only shape the skew lever
applies to. The AQE skew thresholds are lowered proportionally to the
local fixture scale (a ~25 MB hot partition at 16× (column-pruned, compressed shuffle bytes) vs the 256 MB
default knee it was designed for at cluster scale) — the A/B measures the
MECHANISM; at 100 TB the defaults govern and the hot partition is tens of
GB, far past the knee.

Usage:
    python tools/skew_ab.py --dirs /tmp/stress_8x /tmp/stress_16x \
        [--hot-mod 10] [--hot-lt 3] [--repeats 3]

Prints one JSON line per (dir, variant) cell, then a summary with the
speedup and whether the final adaptive plan shows skew-split reads.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", nargs="+", required=True)
    ap.add_argument("--hot-mod", type=int, default=10)
    ap.add_argument("--hot-lt", type=int, default=3)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from pyspark.sql import functions as F

    from databricks_spark_sql_challenge1_spark.catalog import load_table
    from databricks_spark_sql_challenge1_spark.session import get_spark

    spark = get_spark("skew-ab")
    # force the genuine shuffled sort-merge shape and scale the AQE skew
    # knee down to the local fixture (see module docstring)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4MB"
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

    def run(d: str):
        li = load_table(spark, d, "lineitem")
        orders = load_table(spark, d, "orders")
        hot = orders.select(F.min("o_orderkey")).first()[0]
        probe = li.withColumn(
            "k",
            F.when(
                F.col("l_orderkey") % args.hot_mod < args.hot_lt, F.lit(hot)
            ).otherwise(F.col("l_orderkey")),
        )
        joined = probe.join(orders, probe.k == orders.o_orderkey)
        agg = joined.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("l_extendedprice") * 100).cast("long")
                + (F.col("o_totalprice") * 100).cast("long")
            ).alias("checksum"),
        )
        row = agg.collect()[0]
        # after the action, explain() renders the FINAL adaptive plan
        plan = agg._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        return row, plan

    summary = {}
    for d in args.dirs:
        cells = {}
        for variant, enabled in (("skew_on", "true"), ("skew_off", "false")):
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", enabled)
            run(d)  # warm-up, discarded
            times, rows, plans = [], [], []
            for _ in range(args.repeats):
                t0 = time.monotonic()
                row, plan = run(d)
                times.append(time.monotonic() - t0)
                rows.append((row["n"], row["checksum"]))
                plans.append(plan)
            assert len(set(rows)) == 1, rows
            cell = {
                "dir": d,
                "variant": variant,
                "median_s": round(statistics.median(times), 3),
                "times": [round(t, 3) for t in times],
                "n_rows": rows[0][0],
                "checksum": rows[0][1],
                "skew_in_plan": "skew=true" in plans[-1],
            }
            print(json.dumps(cell), flush=True)
            cells[variant] = cell
        assert (
            cells["skew_on"]["n_rows"] == cells["skew_off"]["n_rows"]
            and cells["skew_on"]["checksum"] == cells["skew_off"]["checksum"]
        ), "A/B results diverged"
        summary[d] = {
            "skew_on_s": cells["skew_on"]["median_s"],
            "skew_off_s": cells["skew_off"]["median_s"],
            "speedup": round(
                cells["skew_off"]["median_s"] / cells["skew_on"]["median_s"], 2
            ),
            "skew_split_visible": cells["skew_on"]["skew_in_plan"],
            "row_identical": True,
        }
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
