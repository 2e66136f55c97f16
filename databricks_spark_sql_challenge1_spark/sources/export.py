"""Export primitives — reference S8/S9 (SURVEY.md §2.1).

``export_as_txt`` (ref ``py:32-47``): distributed single-file CSV write
(``coalesce(1)``) then a driver-local rewrite of the part-file into a final
``.txt`` with the requested delimiter — ``os``/``glob`` replacing
``dbutils.fs``.
"""

from __future__ import annotations

import csv
import glob
import os

from pyspark.sql import DataFrame


def export_single_csv(df: DataFrame, out_dir: str, delimiter: str = "|") -> str:
    """S8 (ref ``py:33``): one-file CSV with header. ``coalesce(1)`` is
    deliberate output-file control (anti-parallel by design — only for
    small final results like the reference's top-50 export)."""
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .option("delimiter", delimiter)
        .csv(out_dir)
    )
    parts = glob.glob(os.path.join(out_dir, "part-*.csv"))
    if len(parts) != 1:
        raise RuntimeError(f"expected exactly one part file in {out_dir}, got {parts}")
    return parts[0]


def export_as_txt(
    df: DataFrame, out_dir: str, filename: str, delimiter: str = "|"
) -> str:
    """S9 (ref ``py:34-45``): re-write the part-file as ``<filename>.txt``
    row-by-row with the Python csv module, exactly like the reference."""
    part = export_single_csv(df, out_dir, delimiter)
    final = os.path.join(out_dir, f"{filename}.txt")
    with open(part, newline="") as src, open(final, "w", newline="") as dst:
        reader = csv.reader(src, delimiter=delimiter)
        for row in reader:
            dst.write(delimiter.join(row) + "\n")
    return final
