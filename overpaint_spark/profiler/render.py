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


def _table_lines(t: TableProfile, mode: str) -> list[str]:
    """Title + blank + 4-column layout for one table (no chrome)."""
    lines = [f"{t.qualified} — {_rows_label(t, mode)}, {t.column_count} cols", ""]
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
        lines.append(line.rstrip())
    return lines


def _boxed(lines: list[str]) -> list[str]:
    """Wrap content lines in the reference's Ink box: rounded border
    (``borderStyle="round"`` :388) + one cell of padding on every side
    (``padding={1}`` :387)."""
    inner = max((len(ln) for ln in lines), default=0) + 2  # 1-space pad L/R
    out = ["╭" + "─" * inner + "╮", "│" + " " * inner + "│"]
    for ln in lines:
        out.append("│ " + ln.ljust(inner - 2) + " │")
    out.append("│" + " " * inner + "│")
    out.append("╰" + "─" * inner + "╯")
    return out


def render_tables(
    profiles: list[TableProfile], mode: str = "estimated", boxed: bool = False
) -> str:
    """Render the full report to one string (driver-side, stats rows only).

    ``boxed`` reproduces the reference's bordered per-table boxes
    (listTables.tsx:384-390: rounded border, padding 1, one-line margin
    between boxes); the default plain layout keeps the identical data
    contract without the chrome.
    """
    if not profiles:
        return "No tables found.\n"
    head = "~rows (estimated)" if mode == "estimated" else "rows (exact)"
    if boxed:
        out = [f"Tables (schema.table) — {head}, columns:"]
        for t in profiles:
            out.append("")  # marginTop={1} (:386)
            out.extend(_boxed(_table_lines(t, mode)))
        out.append("")
        return "\n".join(out) + "\n"
    out = [f"Tables (schema.table) — {head}, columns:", ""]
    for t in profiles:
        out.extend(_table_lines(t, mode))
        out.append("")
    return "\n".join(out) + "\n"
