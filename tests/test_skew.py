"""Salted aggregation / join equivalence against the unsalted plans."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from overpaint_spark.operators.skew import salted_groupby_agg, salted_join


def _skewed(spark):
    # key "hot" holds 90% of rows
    rows = [Row(k="hot" if i % 10 else f"cold{i}", v=float(i), rid=i) for i in range(1000)]
    return spark.createDataFrame(rows)


def test_salted_groupby_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        r.k: (r.s, r.n, r.mn, r.mx)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("v").alias("n"),
             F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        r.k: (r.s, r.n, r.mn, r.mx)
        for r in salted_groupby_agg(
            df, ["k"],
            {"s": ("v", "sum"), "n": ("v", "count"),
             "mn": ("v", "min"), "mx": ("v", "max")},
            salt_col="rid", n_salt=8,
        ).collect()
    }
    assert plain == salted


def test_salted_groupby_rejects_non_reassociable(spark):
    df = _skewed(spark)
    try:
        salted_groupby_agg(df, ["k"], {"a": ("v", "avg")}, salt_col="rid")
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_salted_join_matches_plain(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [Row(k="hot", tag="H")] + [Row(k=f"cold{i}", tag=f"C{i}") for i in range(0, 1000, 10)]
    )
    plain = sorted((r.rid, r.tag) for r in big.join(small, "k").collect())
    salted = sorted((r.rid, r.tag) for r in salted_join(big, small, "k", salt_col="rid", n_salt=4).collect())
    assert plain == salted
    # left-outer keeps unmatched big rows exactly once
    small2 = small.filter(F.col("k") != "hot")
    plain_lo = sorted((r.rid, r.tag) for r in big.join(small2, "k", "left").collect())
    salted_lo = sorted((r.rid, r.tag) for r in salted_join(big, small2, "k", salt_col="rid", n_salt=4, how="left").collect())
    assert plain_lo == salted_lo


def test_salted_join_rejects_small_side_preserving_how(spark):
    """right/full joins would emit n_salt copies of every unmatched
    small-side row — must raise, not silently multiply."""
    import pytest

    from overpaint_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, "x")], "k long, v string")
    small = spark.createDataFrame([(2, "y")], "k long, w string")
    with pytest.raises(ValueError, match="big-side-preserving"):
        salted_join(big, small, "k", salt_col="k", n_salt=4, how="full")
    # the valid shapes still work
    out = salted_join(big, small, "k", salt_col="k", n_salt=4, how="left")
    assert out.count() == 1
