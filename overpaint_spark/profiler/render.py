"""Plain-text renderer reproducing the reference's display contract.

The reference renders with Ink/React (``listTables.tsx:363-469``); the
contract (per ``README.md:13-45`` of the reference) is:

- header line: ``Tables (schema.table) — ~rows (estimated), columns:`` or
  ``... — rows (exact), columns:`` (:432, mode switch :514-520),
- per table: ``schema.table — ~N rows, K cols`` (estimated) or
  ``schema.table — N rows, K cols`` (exact); a failed exact count renders
  ``error`` (:367-368, :400-402),
- a 4-column fixed-width layout ``name | type | range | values`` with
  widths = max cell length per column, range width floored at 5
  (:379-381, :427-429), cells left-padded with ``str.ljust`` (:441-457),
- empty catalog → ``No tables found.`` (:509-512).
"""

from __future__ import annotations

from overpaint_spark.functions import formatting, typeclass
from overpaint_spark.profiler.profile import ColumnProfile, TableProfile

HEADERS = ("name", "type", "range", "values")


def _range_cell(col: ColumnProfile) -> str:
    if typeclass.is_numeric(col.data_type):
        return formatting.numeric_range_cell(col.min_value, col.max_value)
    if typeclass.is_temporal(col.data_type):
        return formatting.temporal_range_cell(col.data_type, col.min_value, col.max_value)
    return ""


def _values_cell(col: ColumnProfile) -> str:
    if typeclass.is_boolean(col.data_type):
        return formatting.boolean_values_cell(col.true_count, col.false_count)
    if col.top_values is not None:
        return formatting.top_values_cell(col.top_values, col.non_null_count)
    return ""


def _rows_label(t: TableProfile, mode: str) -> str:
    if mode == "exact":
        n = "error" if t.exact_rows is None else str(t.exact_rows)
        return f"{n} rows"
    n = t.estimated_rows if t.estimated_rows is not None else 0
    return f"~{n} rows"


def render_tables(profiles: list[TableProfile], mode: str = "estimated") -> str:
    """Render the full report to one string (driver-side, stats rows only)."""
    if not profiles:
        return "No tables found.\n"
    head = "~rows (estimated)" if mode == "estimated" else "rows (exact)"
    out: list[str] = [f"Tables (schema.table) — {head}, columns:", ""]
    for t in profiles:
        out.append(f"{t.qualified} — {_rows_label(t, mode)}, {t.column_count} cols")
        out.append("")
        cells = [
            (c.name, c.human_type, _range_cell(c), _values_cell(c))
            for c in t.columns
        ]
        widths = [
            max([len(h)] + [len(r[i]) for r in cells]) for i, h in enumerate(HEADERS)
        ]
        widths[2] = max(widths[2], 5)  # range-width floor (:427-429)
        for row in [HEADERS, *cells]:
            line = "  ".join(cell.ljust(widths[i]) for i, cell in enumerate(row))
            out.append(line.rstrip())
        out.append("")
    return "\n".join(out) + "\n"
