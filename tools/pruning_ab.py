"""Partition-pruning A/B: measure a date-restricted aggregate against a
plain parquet copy vs a year/month hive-partitioned layout of the same
rows (the SCALE.md companion experiment to the bucketed-join A/B — the
plan-shape side is already pinned in tests/test_sources.py; this records
the local timing floor of the pruning win).

Usage: python tools/pruning_ab.py [sf_dir] (default /tmp/stress_8x)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from databricks_spark_sql_challenge1_spark.catalog import load_table
from databricks_spark_sql_challenge1_spark.session import get_spark


def timed(fn, repeats=3):
    fn()  # warm-up, discarded
    runs = []
    for _ in range(repeats):
        t0 = time.monotonic()
        fn()
        runs.append(time.monotonic() - t0)
    return statistics.median(runs), [round(r, 2) for r in runs]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_8x"
    base = f"/tmp/spark_graft_u{os.getuid()}_pruning_ab"
    spark = get_spark("pruning-ab")
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    ).withColumn("order_month", F.month("o_orderdate"))

    plain, parted = f"{base}/plain", f"{base}/parted"
    t0 = time.monotonic()
    orders.write.mode("overwrite").parquet(plain)
    t_plain_build = time.monotonic() - t0
    t0 = time.monotonic()
    orders.write.partitionBy("order_year", "order_month").mode(
        "overwrite"
    ).parquet(parted)
    t_part_build = time.monotonic() - t0

    def agg(path):
        df = spark.read.parquet(path)
        return (
            df.where(
                (F.col("order_year") == 1998) & (F.col("order_month") == 1)
            )
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("o_totalprice").alias("v"),
            )
            .collect()
        )

    m_plain, r_plain = timed(lambda: agg(plain))
    m_part, r_part = timed(lambda: agg(parted))
    # sanity: identical results
    a = sorted(map(tuple, agg(plain)))
    b = sorted(map(tuple, agg(parted)))

    # structural metric: scan units the planner touches (this is what
    # scales — wall-clock parity at 1.2M warm-cache local rows does not)
    import glob

    total_parts = len(glob.glob(f"{parted}/order_year=*/order_month=*"))

    def matched_files(path):
        # files that still appear AFTER the filter — exact for the
        # partitioned side (pruning removes whole directories before the
        # scan). NOT a fair scan-cost metric for the plain side: a plain
        # file with zero matching rows is still read (footer + stats +
        # any surviving row groups) yet would vanish from this list.
        df = spark.read.parquet(path).where(
            (F.col("order_year") == 1998) & (F.col("order_month") == 1)
        )
        files = [
            r[0].replace("file://", "").replace("file:", "")
            for r in df.select(F.input_file_name()).distinct().collect()
        ]
        return len(files), sum(os.path.getsize(f) for f in files)

    def layout_total(path):
        files = glob.glob(f"{path}/**/*.parquet", recursive=True)
        return len(files), sum(os.path.getsize(f) for f in files)

    part_files, part_bytes = matched_files(parted)
    # the plain scan must consider the whole layout (no partition dirs to
    # drop); row-group stats skip ROWS inside files, not files
    plain_files, plain_bytes = layout_total(plain)
    print(
        {
            "sf_dir": sf_dir,
            "rows": orders.count(),
            "build_plain_s": round(t_plain_build, 2),
            "build_partitioned_s": round(t_part_build, 2),
            "query_plain_s": round(m_plain, 3),
            "query_plain_runs": r_plain,
            "query_partitioned_s": round(m_part, 3),
            "query_partitioned_runs": r_part,
            "results_identical": a == b,
            "partitions_total": total_parts,
            "scan_partitioned": {"files": part_files, "bytes": part_bytes},
            "scan_plain": {"files": plain_files, "bytes": plain_bytes},
        }
    )
    spark.stop()


if __name__ == "__main__":
    main()
