"""Staged self-overwrite — reference S10 (SURVEY.md §2.1, §2.13 gotcha 7).

The reference filters ``delta.carts`` and writes the result back onto
``delta.carts`` (ref ``py:162-166``) — legal only because Delta snapshots
the read. On plain parquet the same visible semantics need a staging step:
materialize the filtered result, then atomically swap directories.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def staged_overwrite(spark: SparkSession, df: DataFrame, target_path: str) -> None:
    """Write ``df`` (which may read from ``target_path``) back onto
    ``target_path`` safely: stage → swap → clean.

    With Delta on the classpath this is a plain
    ``.format("delta").mode("overwrite")`` write; this staged variant keeps
    the pipeline runnable on any parquet-only install.
    """
    staging = f"{target_path}.staging-{uuid.uuid4().hex[:8]}"
    backup = f"{target_path}.backup-{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(staging)
    os.rename(target_path, backup)
    try:
        os.rename(staging, target_path)
    except Exception:
        os.rename(backup, target_path)  # roll back
        raise
    shutil.rmtree(backup)
