"""Z-order (Morton-curve) table layout — multi-dimensional file skipping.

``write_sorted`` (bucketing.py) clusters ONE column, so row-group
min/max stats prune scans filtered on that column; a filter on any
other column still reads everything. Z-ordering interleaves the bits of
several columns into one sort key, so every file covers a small
HYPER-RECTANGLE of the value space: per-file min/max ranges tighten on
ALL z-ordered columns at once and a predicate on any of them skips most
files (the Parquet/DSv2 reader does the skipping from footer stats —
no custom reader needed).

The key is built from caller-supplied bounds (at 100 TB these come from
existing profile stats — no extra scan), pure integer codegen
expressions, one range repartition + local sort. This is the standard
lakehouse OPTIMIZE ZORDER BY shape, expressed with public DataFrame
APIs; `tests/test_zorder.py` asserts the tightened per-file footer
ranges directly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scaled(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a value into the integer grid [0, 2^bits): linear scale from
    [lo, hi], clamped (out-of-bounds values sort to the grid edge —
    layout quality degrades gracefully if bounds are stale). Equal
    bounds (a constant column, e.g. stale stats of a single-tenant
    extract) grid everything to 0 rather than dividing by zero — ANSI
    mode would otherwise abort the whole z-order write."""
    top = (1 << bits) - 1
    if hi == lo:
        return F.lit(0).cast("long")
    frac = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    idx = F.floor(frac * F.lit(float(top)))
    return F.greatest(F.lit(0), F.least(F.lit(top), idx)).cast("long")


def zvalue(
    cols: list[Column],
    bounds: list[tuple[float, float]],
    bits: int = 12,
) -> Column:
    """The Morton code: bit i of column j lands at position
    ``i * n_cols + j``. Pure shift/or expressions — whole-stage codegen,
    no UDF. ``bits * len(cols)`` must fit a long (≤ 63)."""
    n = len(cols)
    if n != len(bounds):
        raise ValueError("one (lo, hi) bound pair per column required")
    if bits * n > 63:
        raise ValueError(f"{bits} bits x {n} cols exceeds a long")
    scaled = [
        _scaled(c, lo, hi, bits) for c, (lo, hi) in zip(cols, bounds)
    ]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, s in enumerate(scaled):
            bit = F.shiftright(s, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bounds: list[tuple[float, float]],
    n_files: int,
    bits: int = 12,
) -> None:
    """Write ``df`` z-ordered on ``cols`` as ``n_files`` parquet files.

    Range-repartition on the z-value (contiguous curve segments per
    file) + local sort; the helper column never reaches the files.
    One shuffle — same cost class as any clustered write.
    """
    z = zvalue([F.col(c) for c in cols], bounds, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
