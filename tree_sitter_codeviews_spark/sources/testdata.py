"""Readers for the driver-generated parquet tables (TESTDATA.md).

At cluster scale these become Iceberg catalog reads
(``spark.read.format("iceberg").load(...)``) partitioned by
``bucket(url)`` / ``days(warc_ts)``; in the sandbox they are plain parquet.
Column pruning + predicate pushdown happen automatically as long as callers
``select`` narrow early — verified in tests via ``explain``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
