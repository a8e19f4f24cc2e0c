"""The gate comparator must have teeth: deliberate mismatches of every kind
(value, row count, column name) must FAIL — a comparator that silently
passes wrong results would invalidate every green row."""

from __future__ import annotations

import pytest

from tests.oracle_util import assert_matches


def test_comparator_accepts_identity(spark, sf_tiny):
    df = spark.sql("SELECT 1 AS a, 'x' AS b")
    assert_matches(df, sf_tiny, "SELECT 1 AS a, 'x' AS b", "identity")


def test_comparator_rejects_value_drift(spark, sf_tiny):
    df = spark.sql("SELECT 1 AS a")
    with pytest.raises(AssertionError):
        assert_matches(df, sf_tiny, "SELECT 2 AS a", "value")


def test_comparator_rejects_row_count_drift(spark, sf_tiny):
    df = spark.sql("SELECT 1 AS a")
    with pytest.raises(AssertionError):
        assert_matches(df, sf_tiny, "SELECT 1 AS a UNION ALL SELECT 1", "rows")


def test_comparator_rejects_column_rename(spark, sf_tiny):
    df = spark.sql("SELECT 1 AS a")
    with pytest.raises(AssertionError):
        assert_matches(df, sf_tiny, "SELECT 1 AS b", "colname")


def test_comparator_rejects_int_vs_float_representation(spark, sf_tiny):
    """The r3 events_json_stats regression class: DuckDB sum(BIGINT) widens
    to HUGEINT -> float64 ("9707.0") while Spark keeps BIGINT ("9707").
    Values identical, driver hash diverges — the mirror must catch it."""
    df = spark.sql("SELECT CAST(9707 AS BIGINT) AS sum_k")
    with pytest.raises(AssertionError, match="int-vs-float"):
        # uncast HUGEINT sum: fetchdf() materializes it as float64
        assert_matches(
            df, sf_tiny,
            "SELECT sum(x) AS sum_k FROM (SELECT CAST(9707 AS BIGINT) AS x)",
            "hugeint",
        )


def test_comparator_rejects_sixth_decimal_drift(spark, sf_tiny):
    # rounding discipline: a 1e-6 value drift is NOT noise to the gate
    df = spark.sql("SELECT 0.123456 AS a")
    with pytest.raises(AssertionError):
        assert_matches(df, sf_tiny, "SELECT 0.123457 AS a", "ulp")
