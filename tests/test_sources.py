"""Pipeline test (SURVEY.md §5.2.2): ingest → clean/overwrite → export on
sf0.001, asserting row counts and the pipe-delimited export layout
(reference S1-S10)."""

from __future__ import annotations

import csv
import os
import shutil
import zipfile

import pytest
from pyspark.sql import functions as F

from databricks_spark_sql_challenge1_spark.catalog import load_table
from databricks_spark_sql_challenge1_spark.operators.export_denorm import (
    order_export_denorm,
)
from databricks_spark_sql_challenge1_spark.sources.export import (
    export_as_txt,
    export_single_csv,
)
from databricks_spark_sql_challenge1_spark.sources.ingest import (
    read_csv_pipe,
    read_parquet,
    read_zipped_parquet,
)
from databricks_spark_sql_challenge1_spark.sources.overwrite import staged_overwrite
from tests.conftest import SF_DIR


def test_csv_pipe_roundtrip(spark, tmp_path):
    """S1+S8: pipe-CSV written then read back, header-driven all-string."""
    nation = load_table(spark, SF_DIR, "nation")
    out = str(tmp_path / "nation_csv")
    export_single_csv(nation, out, delimiter="|")
    back = read_csv_pipe(spark, out)
    assert back.count() == nation.count()
    assert back.columns == nation.columns
    assert all(t == "string" for _, t in back.dtypes)  # no inferSchema


def test_zipped_parquet(spark, tmp_path):
    """S3: zip → driver-side extract → distributed scan."""
    src = os.path.join(SF_DIR, "region.parquet")
    zpath = str(tmp_path / "region.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        if os.path.isdir(src):
            for f in os.listdir(src):
                zf.write(os.path.join(src, f), f)
        else:
            zf.write(src, "region.parquet")
    df = read_zipped_parquet(spark, zpath, work_dir=str(tmp_path / "unzipped"))
    assert df.count() == load_table(spark, SF_DIR, "region").count()


def test_staged_overwrite(spark, tmp_path):
    """S10: filter a table and write it back onto its own path."""
    orders_path = str(tmp_path / "orders_copy")
    load_table(spark, SF_DIR, "orders").write.parquet(orders_path)
    before = spark.read.parquet(orders_path)
    n_before = before.count()
    filtered = spark.read.parquet(orders_path).where(F.col("o_orderstatus") == "O")
    n_expected = filtered.count()
    staged_overwrite(spark, filtered, orders_path)
    after = spark.read.parquet(orders_path)
    assert after.count() == n_expected < n_before
    assert set(r["o_orderstatus"] for r in after.select("o_orderstatus").distinct().collect()) == {"O"}


def test_create_database_and_save_table(spark):
    """S4/S5: idempotent DDL + managed-table overwrite write."""
    from databricks_spark_sql_challenge1_spark.sources.ingest import (
        create_database,
        save_table,
    )

    create_database(spark, "challenge1")
    create_database(spark, "challenge1")  # idempotent
    nation = load_table(spark, SF_DIR, "nation")
    save_table(nation, "challenge1.nation_copy")
    save_table(nation, "challenge1.nation_copy")  # overwrite mode
    assert spark.table("challenge1.nation_copy").count() == nation.count()
    spark.sql("DROP TABLE challenge1.nation_copy")
    spark.sql("DROP DATABASE challenge1")


def test_export_as_txt_layout(spark, tmp_path):
    """S9 + ref #14: the denormalized top-50 exported as pipe-delimited txt."""
    df = order_export_denorm(spark, SF_DIR)
    out = str(tmp_path / "export")
    final = export_as_txt(df, out, filename="orders", delimiter="|")
    assert final.endswith("orders.txt")
    with open(final) as fh:
        lines = fh.read().splitlines()
    assert len(lines) == 51  # header + top-50
    header = lines[0].split("|")
    assert header == df.columns
    assert all(len(line.split("|")) == len(header) for line in lines[1:])


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Predicates on the partition column must become PartitionFilters on
    the scan (directory pruning) — and never degrade to a full scan."""
    from pyspark.sql import functions as F

    from databricks_spark_sql_challenge1_spark.catalog import load_table
    from databricks_spark_sql_challenge1_spark.plans.explain import formatted_plan
    from databricks_spark_sql_challenge1_spark.sources.ingest import (
        read_partitioned,
        write_partitioned,
    )

    orders = load_table(spark, SF_DIR, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    write_partitioned(orders, path, "order_year")

    back = read_partitioned(spark, path).where(F.col("order_year") == 2001)
    plan = formatted_plan(back)
    scan = next(
        seg for seg in plan.split("\n\n") if "PartitionFilters" in seg
    )
    assert "order_year" in scan.split("PartitionFilters", 1)[1].splitlines()[0]

    expected = orders.where(F.col("order_year") == 2001).count()
    assert back.count() == expected > 0


def test_jsonl_roundtrip(spark, tmp_path):
    """documents → gzip JSONL shards → read back with explicit schema:
    identical rows, and the compressed files are real .json.gz parts."""
    import os

    from databricks_spark_sql_challenge1_spark.catalog import load_table
    from databricks_spark_sql_challenge1_spark.sources.ingest import (
        read_jsonl,
        write_jsonl,
    )

    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs.repartition(4), path)
    parts = [f for f in os.listdir(path) if f.endswith(".json.gz")]
    assert len(parts) == 4, parts
    back = read_jsonl(spark, path, schema=docs.schema)
    assert sorted(back.columns) == sorted(docs.columns)
    want = sorted(tuple(str(x) for x in r) for r in docs.collect())
    got = sorted(
        tuple(str(x) for x in r)
        for r in back.select(*docs.columns).collect()
    )
    assert got == want


def test_jsonl_write_mode_error_refuses_clobber(spark, tmp_path):
    from databricks_spark_sql_challenge1_spark.sources.ingest import write_jsonl

    docs = spark.range(3).selectExpr("id AS doc_id", "CAST(id AS STRING) AS text")
    path = str(tmp_path / "docs_jsonl_mode")
    write_jsonl(docs, path, mode="error")
    import pytest as _pytest

    with _pytest.raises(Exception, match="already exists"):
        write_jsonl(docs, path, mode="error")
    # default stays overwrite (documented destructive ingest semantics)
    write_jsonl(docs, path)


def test_orc_roundtrip(spark, tmp_path):
    """documents → zstd ORC shards → read back (schema from the ORC
    footer, no inference): identical rows, real .orc parts, and the
    re-scan keeps the pruned-schema contract (only requested columns in
    ReadSchema)."""
    import os

    from databricks_spark_sql_challenge1_spark.catalog import load_table
    from databricks_spark_sql_challenge1_spark.sources.ingest import (
        read_orc,
        write_orc,
    )

    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "docs_orc")
    write_orc(docs.repartition(4), path)
    parts = [f for f in os.listdir(path) if f.endswith(".orc")]
    assert len(parts) == 4, parts
    back = read_orc(spark, path)
    assert sorted(back.columns) == sorted(docs.columns)
    want = sorted(tuple(str(x) for x in r) for r in docs.collect())
    got = sorted(
        tuple(str(x) for x in r)
        for r in back.select(*docs.columns).collect()
    )
    assert got == want
    # column pruning reaches the ORC scan like it does the parquet one
    plan = back.select("doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "text" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_orc_scan_pushes_predicates(spark, tmp_path):
    """ORC rides the same V1 scan machinery as parquet — assert the
    pushed-filter contract holds (not just column pruning) so a format
    swap can't silently turn filters into post-scan work."""
    from databricks_spark_sql_challenge1_spark.catalog import load_table
    from databricks_spark_sql_challenge1_spark.sources.ingest import (
        read_orc,
        write_orc,
    )

    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "docs_orc_pred")
    write_orc(docs, path)
    back = read_orc(spark, path).where(F.col("doc_id") > 10)
    plan = back._jdf.queryExecution().executedPlan().toString()
    pushed = plan.split("PushedFilters: [", 1)[1].split("]")[0]
    assert "GreaterThan(doc_id,10)" in pushed, pushed
