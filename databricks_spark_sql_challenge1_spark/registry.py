"""Central query registry.

Every implemented operator registers a ``(spark, sf_dir) -> DataFrame``
callable and (where SQL-expressible) a DuckDB oracle SQL string. The driver
harness (``__spark_entry__.py``) exposes these via ``queries()`` /
``oracle_sql()`` and compares row-count + schema + order-insensitive
value-hash at sf0.01.

Alignment rules (enforced by convention in every registered pair):
  - every computed column aliased identically on both sides;
  - integer-kind outputs are BIGINT/long on both sides (oracle CASTs where
    DuckDB widens, e.g. year() -> BIGINT is cast to INT to match F.year);
  - floating SUM outputs rounded to a fixed scale on BOTH sides so
    summation-order drift cannot flip the value hash;
  - every LIMIT query carries a total-order ORDER BY (explicit NULLS
    FIRST/LAST) so the selected row set is deterministic across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Decorator: register a query and optionally its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco
