"""Regenerate the QUERIES.md catalog table from the registry.

Rewrites only the `| # | query | ...` table body (docstring first lines);
the hand-written sections below it (coverage map, driver-window accounting)
are left untouched. Run: ``python tools/gen_queries_md.py``.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import databricks_spark_sql_challenge1_spark.operators  # noqa: F401,E402
import databricks_spark_sql_challenge1_spark.streaming.events_stream  # noqa: F401,E402
from databricks_spark_sql_challenge1_spark.registry import ORACLES, QUERIES  # noqa: E402

QUERIES_MD = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md")


def main() -> None:
    rows = []
    for i, name in enumerate(sorted(QUERIES), 1):
        fn = QUERIES[name]
        mod = fn.__module__.rsplit(".", 1)[-1]
        lines = [ln.strip() for ln in (fn.__doc__ or "").strip().splitlines() if ln.strip()]
        doc = lines[0] if lines else ""
        kind = "oracle" if name in ORACLES else "rows-only"
        rows.append(f"| {i} | `{name}` | {mod} | {kind} | {doc} |")

    with open(QUERIES_MD) as f:
        text = f.read()
    new = re.sub(
        r"(\| # \| query \| module \| oracle \| what it covers \|\n\|[-| ]+\|\n)(\|.*\n)+",
        r"\1" + "\n".join(rows) + "\n",
        text,
        count=1,
    )
    with open(QUERIES_MD, "w") as f:
        f.write(new)
    print(f"wrote {len(rows)} rows to QUERIES.md")


if __name__ == "__main__":
    main()
