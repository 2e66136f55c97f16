"""Round-18 optimization probe: per-query plan capture + noop-sink timing.

Usage:
  python tools/opt_probe.py explain <tag> <name> [...]   # plans/r18/<name>_<tag>.txt
  python tools/opt_probe.py time <name> [...]            # noop-sink wall time, fresh session
  python tools/opt_probe.py both <tag> <name> [...]

The noop sink (guide §1.4) computes every column of every row and discards
the result, so the timing isolates the computation from the collect()
driver-transfer term the bench's default sink carries. Timings here are a
diagnostic for the optimization loop; the driver-comparable numbers stay
bench.py's (collect sink, same protocol as every prior round).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r18"
)


def _setup():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from databricks_spark_sql_challenge1_spark.session import get_spark
    import databricks_spark_sql_challenge1_spark.operators  # noqa: F401
    from databricks_spark_sql_challenge1_spark.catalog import last_order_datetime

    spark = get_spark("challenge1-opt-probe")
    spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).count()
    last_order_datetime(spark, sf_dir)
    return spark, sf_dir


def main() -> int:
    mode = sys.argv[1]
    names = sys.argv[2:]
    tag = None
    if mode in ("explain", "both"):
        tag = names[0]
        names = names[1:]
        os.makedirs(PLANS_DIR, exist_ok=True)
    spark, sf_dir = _setup()
    from databricks_spark_sql_challenge1_spark.registry import QUERIES
    from databricks_spark_sql_challenge1_spark.plans.explain import formatted_plan

    out = {}
    for name in names:
        fn = QUERIES[name]
        if mode in ("explain", "both"):
            plan = formatted_plan(fn(spark, sf_dir))
            path = os.path.join(PLANS_DIR, f"{name}_{tag}.txt")
            with open(path, "w") as f:
                f.write(plan)
            n_ex = plan.count("Exchange")
            print(f"{name}: {n_ex} Exchange -> {path}")
        if mode in ("time", "both"):
            spark.sparkContext.setJobDescription(f"opt-probe: {name}")
            # discarded warmup + median of 3, noop sink
            runs = []
            for i in range(4):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            med = sorted(runs[1:])[1]
            out[name] = med
            print(json.dumps({"query": name, "noop_median_sec": med,
                              "runs": runs}))
    if out:
        print(json.dumps({"noop_medians": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
