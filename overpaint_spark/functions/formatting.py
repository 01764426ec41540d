"""Display formatting — pure Python, driver-side only.

Replicates the reference's client-side formatting semantics
(``/root/reference/src/listTables.tsx``) exactly, including the integer
(bigint) percent math, so golden outputs and oracle hashes cannot drift
through float rounding:

- ``formatPercentOneDecimal`` (:51-57): half-up rounding to 0.1% done in
  integer permille arithmetic — ``(n*1000 + d/2) / d``.
- ``booleanPercents`` (:59-79): NULLs excluded from the denominator.
- ``humanDataType`` truncation is in :mod:`overpaint_spark.functions.typeclass`.
- temporal range formatting (:158-182): month-year for date-like values,
  HH:MM for time-of-day values; unparseable → blank.
- numeric range (:414-415): verbatim ``"{min}-{max}"`` concat (a negative
  min renders like ``-5-10`` — preserved for parity).
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

from pyspark.sql import types as T


def format_percent_one_decimal(n: int, d: int) -> str:
    """listTables.tsx:51-57 — bigint half-up rounding to 0.1%.

    ``d == 0`` → ``"0.0%"``; all math in Python ints (arbitrary precision,
    same as JS BigInt).
    """
    if d == 0:
        return "0.0%"
    permille = (n * 1000 + d // 2) // d
    return f"{permille // 10}.{permille % 10}%"


def boolean_values_cell(true_count: int | None, false_count: int | None) -> str:
    """listTables.tsx:59-79 + render :417-421 — ``Yes N (x%) | No M (y%)``.

    NULL counts (failed stats) → blank cell; NULL data rows are in neither
    bucket and excluded from the percent denominator.
    """
    if true_count is None or false_count is None:
        return ""
    t, f = int(true_count), int(false_count)
    d = t + f
    return (
        f"Yes {t} ({format_percent_one_decimal(t, d)}) | "
        f"No {f} ({format_percent_one_decimal(f, d)})"
    )


def top_values_cell(
    values: list[tuple[str, int]] | None, non_null: int | None
) -> str:
    """Categorical generalization of the boolean cell: ``val N (x%) |
    ...`` — the reference only histograms booleans (listTables.tsx:
    310-325); this applies the same format and the same bigint permille
    math to any low-cardinality column, percenting over the non-null
    denominator (NULLs excluded, matching :314-315)."""
    if not values or not non_null:
        return ""
    return " | ".join(
        f"{v} {n} ({format_percent_one_decimal(n, non_null)})" for v, n in values
    )


def _fmt_month_year(v: _dt.date | _dt.datetime) -> str:
    """listTables.tsx:158-161 — ``Jan 2020`` style."""
    return f"{('Jan','Feb','Mar','Apr','May','Jun','Jul','Aug','Sep','Oct','Nov','Dec')[v.month - 1]} {v.year}"


def _fmt_hh_mm(v: _dt.time | _dt.datetime) -> str:
    """listTables.tsx:163-167 — zero-padded ``HH:MM``."""
    return f"{v.hour:02d}:{v.minute:02d}"


def temporal_range_cell(dt: T.DataType, vmin: Any, vmax: Any) -> str:
    """listTables.tsx:169-182 — dispatch on time-ish vs date-ish.

    TimeType columns arrive as ``datetime.time`` min/max (the profiler
    parses the order-preserving string aggregate back) and take the
    ``HH:MM-HH:MM`` branch — the reference's time/timetz rendering
    (listTables.tsx:171-176); typed date/timestamp min/max take the
    ``Mon YYYY-Mon YYYY`` branch. None → blank.
    """
    if vmin is None or vmax is None:
        return ""
    if isinstance(vmin, _dt.time) and isinstance(vmax, _dt.time):
        return f"{_fmt_hh_mm(vmin)}-{_fmt_hh_mm(vmax)}"
    if isinstance(vmin, (_dt.date, _dt.datetime)):
        return f"{_fmt_month_year(vmin)}-{_fmt_month_year(vmax)}"
    return ""


def numeric_range_cell(vmin: Any, vmax: Any) -> str:
    """listTables.tsx:414-415 — raw ``{min}-{max}`` concat, None → blank."""
    if vmin is None or vmax is None:
        return ""
    return f"{_fmt_num(vmin)}-{_fmt_num(vmax)}"


def _fmt_num(v: Any) -> str:
    # Integral floats print like ints (Postgres `100000` not `100000.0`)
    # so the README demo's `1-100000` renders identically.
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)
