"""Z-order layout (sources/zorder.py): per-file footer stats must
tighten on ALL z-ordered dimensions — that tightening IS the file-skip
mechanism, so it's what the tests pin."""

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from overpaint_spark.sources.zorder import zorder_write, zvalue


def _file_ranges(path: str, col: str) -> list[tuple[float, float]]:
    """(min, max) per parquet file from footer metadata only."""
    out = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        out.append((lo, hi))
    return out


def _avg_width(ranges):
    return sum(hi - lo for lo, hi in ranges) / len(ranges)


def test_zvalue_orders_by_locality(spark):
    df = spark.range(4).selectExpr("id % 2 as x", "id div 2 as y")
    z = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y",
            zvalue([F.col("x"), F.col("y")], [(0, 1), (0, 1)], bits=1).alias("z"),
        ).collect()
    }
    # 1-bit, 2-col morton: (0,0)=0 (1,0)=1 (0,1)=2 (1,1)=3
    assert z == {(0, 0): 0, (1, 0): 1, (0, 1): 2, (1, 1): 3}


def test_zvalue_validation(spark):
    with pytest.raises(ValueError, match="bound pair"):
        zvalue([F.col("x")], [], bits=4)
    with pytest.raises(ValueError, match="exceeds a long"):
        zvalue([F.col("x"), F.col("y")], [(0, 1), (0, 1)], bits=32)


def test_zorder_tightens_both_dimensions(spark, tmp_path):
    n = 64
    grid = spark.range(n * n).selectExpr(
        f"CAST(id % {n} AS DOUBLE) AS x", f"CAST(id div {n} AS DOUBLE) AS y"
    )
    bounds = [(0.0, float(n - 1)), (0.0, float(n - 1))]

    zpath = str(tmp_path / "zorder")
    zorder_write(grid, zpath, ["x", "y"], bounds, n_files=16)

    # baseline: single-column clustering — x tightens, y stays global
    xpath = str(tmp_path / "xsort")
    (
        grid.repartitionByRange(16, "x").sortWithinPartitions("x")
        .write.parquet(xpath)
    )

    full = float(n - 1)
    zx, zy = _avg_width(_file_ranges(zpath, "x")), _avg_width(_file_ranges(zpath, "y"))
    bx, by = _avg_width(_file_ranges(xpath, "x")), _avg_width(_file_ranges(xpath, "y"))

    # x-sort: x-ranges are tiny but y-ranges stay ~the whole domain
    assert bx < 0.2 * full and by > 0.9 * full
    # z-order: BOTH dimensions tighten well below the global range
    assert zx < 0.5 * full and zy < 0.5 * full
    # data survives the layout intact
    assert spark.read.parquet(zpath).count() == n * n
