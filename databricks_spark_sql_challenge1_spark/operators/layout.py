"""Data-layout effectiveness audit: Z-order clustering vs insertion order.

At 100 TB the dominant cost of every selective query is the scan, and the
scan's cost is decided before the query runs — by how rows were laid out
into files and what the per-file zone maps (min/max statistics) can prune.
This module measures that decision: it lays the SAME rows out two ways —
multi-dimensionally clustered by a Z-order (Morton) key vs the writer's
insertion order — builds per-file zone maps, and counts how many files and
rows each layout actually scans for three canonical predicate shapes.

The reference notebook's tables are written unclustered (its managed-table
saves, ``py:64-76``); this audit is the extension measurement a 100 TB
deployment runs before choosing a layout. The expected (and measured)
result is the classic trade: insertion order ~ time order prunes the
time-slab query well and the customer-slab query not at all; Z-order
prunes BOTH dimensions to near-optimal file counts at a small cost on the
pure time slab. Exactly the argument for Z-ordering multi-tenant fact
tables.

Scale posture: the production writer is ``repartitionByRange(N_FILES,
z).sortWithinPartitions(z)`` — one range shuffle by sampled z-quantiles,
embarrassingly parallel thereafter. The audit uses ``ntile`` over a total
order instead, which is the deterministic equal-rows equivalent of that
range partitioning (sample-based splits are not oracle-reproducible); the
zone-map pruning arithmetic — the thing being measured — is identical.
Everything is exact integer arithmetic, so the whole audit is
driver-hashable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from databricks_spark_sql_challenge1_spark.catalog import load_table
from databricks_spark_sql_challenge1_spark.registry import query

Z_BITS = 7  # each dimension quantized to 0..127
N_FILES = 64  # files per layout (audit granularity)

# Rectangular probe predicates over the two clustered dimensions
# (x = customer bucket, y = order-month index): name, x0, x1, y0, y1.
PREDICATES: tuple[tuple[str, int, int, int, int], ...] = (
    ("point_both_dims", 10, 19, 60, 65),
    ("time_slab", 0, 127, 100, 107),
    ("customer_slab", 42, 45, 0, 127),
)


def _bit_interleave(xcol: str, ycol: str, intdiv: str) -> str:
    """Morton interleave of two Z_BITS-wide non-negative ints as a plain
    arithmetic SQL expression: bit i of x lands at position 2i, bit i of y
    at 2i+1. ``intdiv`` is the engine's integer-division operator (Spark
    ``div``, DuckDB ``//`` — identical on non-negatives, CLAUDE.md rule).
    """
    terms = []
    for i in range(Z_BITS):
        terms.append(f"((({xcol} {intdiv} {1 << i}) % 2) * {4 ** i})")
        terms.append(f"((({ycol} {intdiv} {1 << i}) % 2) * {2 * 4 ** i})")
    return " + ".join(terms)


# x: customer bucket (hash-free modulo keeps it oracle-exact); y: month
# index from the fixture's first order year. Both land in [0, 127].
_X_SQL = "o_custkey % 128"
_Y_SQL = "((year(o_orderdate) - 1992) * 12 + (month(o_orderdate) - 1)) % 128"


def _oracle_sql() -> str:
    z = _bit_interleave("x", "y", "//")
    preds_values = ", ".join(
        f"('{name}', {x0}, {x1}, {y0}, {y1})"
        for name, x0, x1, y0, y1 in PREDICATES
    )
    return f"""
WITH base AS (
    SELECT o_orderkey,
           CAST({_X_SQL} AS BIGINT) AS x,
           CAST({_Y_SQL} AS BIGINT) AS y
    FROM orders
),
keyed AS (SELECT *, {z} AS z FROM base),
placed AS (
    SELECT x, y,
           ntile({N_FILES}) OVER (ORDER BY z, o_orderkey) AS file_z,
           ntile({N_FILES}) OVER (ORDER BY o_orderkey) AS file_lin
    FROM keyed
),
files AS (
    SELECT layout, file_id,
           min(x) AS min_x, max(x) AS max_x,
           min(y) AS min_y, max(y) AS max_y,
           COUNT(*) AS n_rows
    FROM (
        SELECT 'zorder' AS layout, file_z AS file_id, x, y FROM placed
        UNION ALL
        SELECT 'linear' AS layout, file_lin AS file_id, x, y FROM placed
    )
    GROUP BY layout, file_id
),
preds(predicate, x0, x1, y0, y1) AS (VALUES {preds_values}),
scanned AS (
    SELECT f.layout, p.predicate,
           COUNT(*) AS files_scanned,
           SUM(f.n_rows) AS rows_scanned
    FROM files f JOIN preds p
      ON f.max_x >= p.x0 AND f.min_x <= p.x1
     AND f.max_y >= p.y0 AND f.min_y <= p.y1
    GROUP BY f.layout, p.predicate
),
matches AS (
    SELECT p.predicate, COUNT(*) AS match_rows
    FROM base b JOIN preds p
      ON b.x BETWEEN p.x0 AND p.x1 AND b.y BETWEEN p.y0 AND p.y1
    GROUP BY p.predicate
)
SELECT s.layout, s.predicate,
       CAST(s.files_scanned AS BIGINT) AS files_scanned,
       CAST(s.rows_scanned AS BIGINT) AS rows_scanned,
       CAST(m.match_rows AS BIGINT) AS match_rows
FROM scanned s JOIN matches m ON m.predicate = s.predicate
ORDER BY s.layout ASC, s.predicate ASC
"""


def _prune_audit(
    spark: SparkSession,
    files: DataFrame,
    base: DataFrame,
    grid: DataFrame | None = None,
) -> DataFrame:
    """The zone-map pruning arithmetic shared VERBATIM by the ntile audit
    and the production range writer — the module's "identical pruning
    arithmetic" claim, pinned structurally in one function: overlap-join
    the per-file min/max table against the broadcast predicate rectangles,
    count surviving files and rows per (layout, predicate), and join the
    true per-predicate match counts.

    ``files`` must carry (layout, min_x, max_x, min_y, max_y, n_rows);
    ``base`` must carry (x, y). With ``grid`` (layout × predicate rows)
    every grid row is preserved with zero counts even when no file
    overlaps or no row matches a predicate — the rows-only writer's fixed
    row-count contract. Without it, the inner-join shape is kept because
    that is exactly what the oracle-backed audit's DuckDB SQL mirrors
    (both engines drop a zero-match predicate identically, so they stay
    aligned).
    """
    preds = spark.createDataFrame(
        list(PREDICATES), "predicate string, x0 long, x1 long, y0 long, y1 long"
    )
    scanned = (
        files.join(
            F.broadcast(preds),
            (F.col("max_x") >= F.col("x0"))
            & (F.col("min_x") <= F.col("x1"))
            & (F.col("max_y") >= F.col("y0"))
            & (F.col("min_y") <= F.col("y1")),
        )
        .groupBy("layout", "predicate")
        .agg(
            F.count(F.lit(1)).alias("files_scanned"),
            F.sum("n_rows").alias("rows_scanned"),
        )
    )
    matches = (
        base.join(
            F.broadcast(preds),
            F.col("x").between(F.col("x0"), F.col("x1"))
            & F.col("y").between(F.col("y0"), F.col("y1")),
        )
        .groupBy("predicate")
        .agg(F.count(F.lit(1)).alias("match_rows"))
    )
    if grid is None:
        joined = scanned.join(F.broadcast(matches), "predicate")
    else:
        joined = (
            # scanned is at most layouts x predicates rows — broadcast it
            # so the tiny grid join never plans a sort-merge exchange
            grid.join(F.broadcast(scanned), ["layout", "predicate"], "left")
            .join(F.broadcast(matches), "predicate", "left")
            .select(
                "layout",
                "predicate",
                F.coalesce("files_scanned", F.lit(0)).alias("files_scanned"),
                F.coalesce("rows_scanned", F.lit(0)).alias("rows_scanned"),
                F.coalesce("match_rows", F.lit(0)).alias("match_rows"),
            )
        )
    return joined.select(
        "layout",
        "predicate",
        F.col("files_scanned").cast("bigint").alias("files_scanned"),
        F.col("rows_scanned").cast("bigint").alias("rows_scanned"),
        F.col("match_rows").cast("bigint").alias("match_rows"),
    ).orderBy(F.col("layout").asc(), F.col("predicate").asc())


@query("zorder_file_skipping", oracle=_oracle_sql())
def zorder_file_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map file-skipping audit: for each layout (Z-order vs insertion
    order) and each probe predicate, how many of the N_FILES files survive
    min/max pruning and how many rows they hold — vs the true match count.

    One scan of orders computes (x, y, z); both layouts' file assignments
    come from two window ranks over the same frame (no second scan); zone
    maps are one groupBy over 2·N_FILES groups; pruning joins the 128-row
    zone-map table against the broadcast 3-row predicate table. The only
    corpus-scale steps are the base scan and the two total-order ranks
    (production: repartitionByRange — see module docstring).
    """
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        F.expr(_X_SQL).cast("bigint").alias("x"),
        F.expr(_Y_SQL).cast("bigint").alias("y"),
    )
    keyed = base.withColumn("z", F.expr(_bit_interleave("x", "y", "div")))
    placed = keyed.select(
        "x",
        "y",
        F.ntile(N_FILES).over(Window.orderBy("z", "o_orderkey")).alias("file_z"),
        F.ntile(N_FILES).over(Window.orderBy("o_orderkey")).alias("file_lin"),
    )
    files = (
        placed.select(
            F.expr(
                "stack(2, 'zorder', file_z, 'linear', file_lin) "
                "AS (layout, file_id)"
            ),
            "x",
            "y",
        )
        .groupBy("layout", "file_id")
        .agg(
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    return _prune_audit(spark, files, base)


# In-process state for zorder_range_writer's output dirs (ADVICE r14):
# a monotonic call counter keeps every call's dir distinct, and the atexit
# hook reaps ONLY this process's dirs at exit — cross-process leftovers
# (crash before atexit) are handled by the on-entry dead-pid reaper.
_WRITER_SEQ = [0]
_WRITER_DIRS: list[str] = []


def _reap_own_writer_dirs() -> None:
    import shutil

    for d in _WRITER_DIRS:
        shutil.rmtree(d, ignore_errors=True)


import atexit as _atexit  # noqa: E402

_atexit.register(_reap_own_writer_dirs)


@query("zorder_range_writer")  # rows-only: see docstring
def zorder_range_writer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION Z-order writer the audit above stands in for:
    ``repartitionByRange(N_FILES, z).sortWithinPartitions(z)``, actually
    WRITTEN to parquet, read back, and audited with the same zone-map
    pruning arithmetic — files from ``input_file_name()``, min/max zone
    maps from the real file contents, the same three probe predicates,
    layout labelled ``zorder_range``.

    Registered ROWS-ONLY (VERDICT r13 #5c): ``repartitionByRange`` derives
    its split points by reservoir-sampling the key (nondeterministic
    per-file row assignment), so the per-file zone maps are not
    oracle-reproducible; ``zorder_file_skipping`` — whose deterministic
    ntile placement audits the identical pruning arithmetic — is the
    registered oracle-backed stand-in (registry.ROWS_ONLY_STAND_INS).
    tests/test_extensions.py pins the writer's pruning quality against the
    audit's bounds, and the row count (layouts x predicates) is fixed.

    Scale shape: ONE range shuffle by sampled z-quantiles (the layout job a
    100 TB table runs once per rewrite), an embarrassingly-parallel sorted
    write, then the audit reads back only (x, y) columns — the zone-map
    groupBy is N_FILES groups, the pruning join is broadcast 3 rows.

    NOTE: calling this function RUNS the write — it IS a writer, so unlike
    every other registered query the call itself executes one range
    shuffle + parquet write before the returned audit DataFrame is even
    planned (plan-only consumers like tests/test_plans.py pay that cost
    once per call). The per-(pid, call-seq) output dir keeps concurrent
    callers AND repeat same-process calls from racing on overwrite
    (ADVICE r14: an overwrite would invalidate a previously returned lazy
    DataFrame mid-read) — every DataFrame this function ever returned
    stays readable until the process exits (atexit reaps our own dirs);
    dirs left by exited pids are reaped on entry.
    """
    import os
    import shutil
    import tempfile
    import time as _time

    orders = load_table(spark, sf_dir, "orders")
    keyed = orders.select(
        "o_orderkey",
        F.expr(_X_SQL).cast("bigint").alias("x"),
        F.expr(_Y_SQL).cast("bigint").alias("y"),
    ).withColumn("z", F.expr(_bit_interleave("x", "y", "div")))
    # Per-(pid, call-seq, sf) path: the pid suffix isolates concurrent
    # callers (two processes overwriting one dir would corrupt it); the
    # monotonic call-seq suffix isolates REPEAT same-process calls, so
    # every returned (lazy) DataFrame keeps reading valid files until the
    # process exits — our own dirs are reaped by the atexit hook below.
    # Reap siblings left by pids that no longer exist so repeated
    # bench/pytest/plan runs don't grow /tmp monotonically across rounds.
    tmp = tempfile.gettempdir()
    prefix = "zorder_range_writer_"
    for entry in os.listdir(tmp):
        if not entry.startswith(prefix):
            continue
        pid_part = entry[len(prefix):].split("_", 1)[0]
        # isdecimal, not isdigit: superscript digits pass isdigit() but
        # make int() raise — a crafted entry in world-writable /tmp must
        # not crash the reaper (and every caller with it)
        if not pid_part.isdecimal():
            continue
        pid = int(pid_part)
        if pid == os.getpid():
            continue
        # Age backstop (ADVICE r14): a dead owner's pid can be REUSED by a
        # live unrelated process, making the liveness probe below leak the
        # dir forever. No caller's dir legitimately outlives a week (bench/
        # pytest runs are minutes), so reap on age regardless of pid state.
        try:
            age_s = _time.time() - os.stat(os.path.join(tmp, entry)).st_mtime
        except OSError:
            continue  # raced with another reaper — gone already
        if age_s > 7 * 86400:
            shutil.rmtree(os.path.join(tmp, entry), ignore_errors=True)
            continue
        if pid <= 1:
            # os.kill(0, 0) signals our OWN process group and always
            # succeeds, and pid 1 is init — neither can be a caller, so
            # such an entry would otherwise sit unreapable forever
            shutil.rmtree(os.path.join(tmp, entry), ignore_errors=True)
            continue
        try:
            os.kill(pid, 0)
        except (ProcessLookupError, OverflowError):
            # dead pid, or a decimal string too large to BE a pid: either
            # way the dir is not a live caller's, reap it
            shutil.rmtree(os.path.join(tmp, entry), ignore_errors=True)
        except PermissionError:
            pass  # live pid owned by someone else — leave its dir alone
    _WRITER_SEQ[0] += 1
    out_dir = os.path.join(
        tmp,
        f"{prefix}{os.getpid()}_{_WRITER_SEQ[0]}"
        f"_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    _WRITER_DIRS.append(out_dir)
    (
        keyed.repartitionByRange(N_FILES, "z")
        .sortWithinPartitions("z")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    back = spark.read.parquet(out_dir).select(
        F.input_file_name().alias("file_id"), "x", "y"
    )
    files = back.groupBy("file_id").agg(
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
        F.count(F.lit(1)).alias("n_rows"),
    ).withColumn("layout", F.lit("zorder_range"))
    # Fixed (layouts x predicates) row contract (the docstring's claim the
    # driver's rows-only count rides on): preserve a predicate even when no
    # file overlaps or no row matches it, with zero counts.
    grid = spark.createDataFrame(
        [("zorder_range", name) for name, *_ in PREDICATES],
        "layout string, predicate string",
    )
    return _prune_audit(spark, files, keyed, grid=grid)
