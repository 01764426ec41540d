"""Unit tests for the reference's client-side formatting semantics
(SURVEY §5.3): bigint percent math, type humanization, range cells."""

import datetime as dt

from pyspark.sql import types as T

from overpaint_spark.functions import formatting as FMT
from overpaint_spark.functions import typeclass as TC


class TestPercent:
    def test_zero_denominator(self):
        assert FMT.format_percent_one_decimal(0, 0) == "0.0%"

    def test_basic(self):
        # README demo: 28000/42000 → 66.7%, 14000/42000 → 33.3%
        assert FMT.format_percent_one_decimal(28000, 42000) == "66.7%"
        assert FMT.format_percent_one_decimal(14000, 42000) == "33.3%"

    def test_half_up_boundary(self):
        # 5/1000 = 0.5% exactly: permille = (5*1000 + 500)/1000 = 5 → "0.5%"
        assert FMT.format_percent_one_decimal(5, 1000) == "0.5%"
        # 1/1600 = 0.0625% → permille (1000+800)/1600 = 1 (floor of 1.125) → 0.1%
        assert FMT.format_percent_one_decimal(1, 1600) == "0.1%"
        # exact .05 boundary rounds half-UP in bigint math: 1/2000 → permille
        # (1000+1000)/2000 = 1 → "0.1%", where float round-half-even gives 0.0
        assert FMT.format_percent_one_decimal(1, 2000) == "0.1%"

    def test_hundred_percent(self):
        assert FMT.format_percent_one_decimal(7, 7) == "100.0%"

    def test_bigint_scale(self):
        # counts beyond double precision stay exact (JS BigInt parity)
        n = 2**60 + 1
        assert FMT.format_percent_one_decimal(n, 2 * n) == "50.0%"


class TestBooleanCell:
    def test_null_counts_blank(self):
        assert FMT.boolean_values_cell(None, 3) == ""

    def test_cell(self):
        assert FMT.boolean_values_cell(28000, 14000) == "Yes 28000 (66.7%) | No 14000 (33.3%)"

    def test_degenerate_all_true(self):
        assert FMT.boolean_values_cell(5, 0) == "Yes 5 (100.0%) | No 0 (0.0%)"

    def test_empty_table(self):
        assert FMT.boolean_values_cell(0, 0) == "Yes 0 (0.0%) | No 0 (0.0%)"


class TestHumanType:
    def test_map(self):
        assert TC.human_type(T.LongType()) == "bigint"
        assert TC.human_type(T.DoubleType()) == "float8"
        assert TC.human_type(T.FloatType()) == "real"
        assert TC.human_type(T.StringType()) == "text"
        assert TC.human_type(T.BooleanType()) == "bool"
        assert TC.human_type(T.TimestampNTZType()) == "ts-ntz"
        assert TC.human_type(T.TimestampType()) == "tstz"
        assert TC.human_type(T.BinaryType()) == "bytea"

    def test_decimal_is_numeric_postgres_name(self):
        assert TC.human_type(T.DecimalType(10, 2)) == "numeric"

    def test_unknown_truncated_to_8(self):
        t = T.ArrayType(T.FloatType())
        assert TC.human_type(t) == "array<fl"
        assert len(TC.human_type(T.MapType(T.StringType(), T.LongType()))) <= 8


class TestRanges:
    def test_numeric_negative_min_verbatim(self):
        # listTables.tsx:414-415 — raw concat, "-5-10" preserved
        assert FMT.numeric_range_cell(-5, 10) == "-5-10"

    def test_numeric_integral_floats(self):
        assert FMT.numeric_range_cell(1.0, 100000.0) == "1-100000"

    def test_numeric_null_blank(self):
        assert FMT.numeric_range_cell(None, 10) == ""

    def test_temporal_month_year(self):
        lo = dt.datetime(2020, 1, 15, 3, 4)
        hi = dt.datetime(2025, 10, 1)
        assert FMT.temporal_range_cell(T.TimestampNTZType(), lo, hi) == "Jan 2020-Oct 2025"

    def test_temporal_time_only(self):
        assert (
            FMT.temporal_range_cell(T.StringType(), dt.time(0, 0), dt.time(23, 59))
            == "00:00-23:59"
        )

    def test_temporal_null_blank(self):
        assert FMT.temporal_range_cell(T.DateType(), None, None) == ""
