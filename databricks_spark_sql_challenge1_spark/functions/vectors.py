"""Vector arithmetic as Catalyst array expressions — JVM-side, no UDFs.

``F.aggregate``/``F.zip_with`` fold over array<double> columns inside
whole-stage codegen; this is the built-in-operator path SURVEY.md §7 Stage 3
prescribes for cosine similarity (Pandas UDFs reserved for genuinely
inexpressible ops, see operators/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    # A ZERO-norm vector has no defined cosine: DuckDB's
    # list_cosine_similarity returns -1.0 for it (measured in this
    # container — the oracle side of every similarity query), so match
    # that instead of dividing by zero, which is an ANSI job abort in
    # Spark (round-13 fuzz-parity find). A NULL input must stay NULL,
    # NOT -1.0: retrieval builds vectors through joins whose misses are
    # NULL, and the oracles rank those rows as NULL (a coalesce(x, -1.0)
    # form silently re-ranked 4 sf0.1 rerank rows — measured, round-13
    # review follow-up). when(NULL == 0) is false-ish, so a NULL den
    # falls through to dot/NULL = NULL on its own.
    den = l2_norm(a) * l2_norm(b)
    return F.when(den == 0, F.lit(-1.0)).otherwise(dot(a, b) / den)
