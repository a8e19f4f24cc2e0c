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


def test_comparator_rejects_sixth_decimal_drift(spark, sf_tiny):
    # rounding discipline: a 1e-6 value drift is NOT noise to the gate
    df = spark.sql("SELECT 0.123456 AS a")
    with pytest.raises(AssertionError):
        assert_matches(df, sf_tiny, "SELECT 0.123457 AS a", "ulp")
