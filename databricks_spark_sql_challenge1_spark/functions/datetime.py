"""Date-window helpers for the reference's DATEADD-anchored queries.

The reference anchors every trend query on ``${carts.last_datetime}`` with
``DATEADD(MONTH, -n, ...)`` / ``DATEADD(YEAR, -1, ...)`` (Databricks-ism,
SURVEY.md §2 F5). We compute the shifted (year, month) pair driver-side and
splice integer literals into the plan — Catalyst then constant-folds the
predicates exactly as the reference's lexical substitution did.
"""

from __future__ import annotations

import datetime as dt


def shift_months(ts: dt.datetime, months: int) -> tuple[int, int]:
    """(year, month) of ``ts`` shifted by ``months`` (can be negative)."""
    y, m = ts.year, ts.month + months
    y += (m - 1) // 12
    m = (m - 1) % 12 + 1
    return y, m


def month_start(year: int, month: int) -> dt.date:
    return dt.date(year, month, 1)


def date_literal(d: dt.date | dt.datetime) -> str:
    """Render a date/datetime as the literal string spliced into plans."""
    if isinstance(d, dt.datetime):
        return d.strftime("%Y-%m-%d %H:%M:%S")
    return d.strftime("%Y-%m-%d")
