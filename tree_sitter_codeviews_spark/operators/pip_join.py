"""Two-phase spatial containment join: cell-cover prefilter + exact refine.

Structure transplanted from the reference's use→declaration resolution
(SURVEY.md §2.3 row 1): equi-join on a cheap key (there: variable name; here:
coarse cover cell) to prune the candidate space, then an exact predicate
(there: ``scope_check`` prefix containment, ``SDFG_c.py:53-68``; here:
ray-casting point-in-polygon), then an optional "longest containment wins"
top-1 (there: ``longest_scope_match``, ``c_parser.py:134-140``; here: deepest
``admin_level``).

Physical shape at 100 TB:
- the polygon cover table is a small dim → **broadcast** equi-join (map-side,
  no shuffle of the 10^12-row points side);
- the refine predicate is a single vectorized Arrow-batch pandas UDF applied
  post-join (never a theta/cross join);
- the prefilter key is the point's *parent* cell at cover resolution —
  computed from its fine cell by bit-truncation, no re-encode.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .. import cells, geometry, layers

COVER_RES = 4  # coarse prefilter grid (16x16 world): few cover cells/polygon

# rings keyed by polygon_id, shipped to executors via closure capture
# (equivalent to a broadcast variable; the dim is constant and tiny)
_RINGS: dict[int, np.ndarray] = {
    p["polygon_id"]: np.asarray(p["ring"], dtype=np.float64) for p in layers.POLYGONS
}


def polygons_df(spark: SparkSession) -> DataFrame:
    rows = [
        (p["polygon_id"], p["admin_level"],
         [(float(lon), float(lat)) for lon, lat in p["ring"]])
        for p in layers.POLYGONS
    ]
    schema = T.StructType([
        T.StructField("polygon_id", T.LongType()),
        T.StructField("admin_level", T.IntegerType()),
        T.StructField("ring", T.ArrayType(T.StructType([
            T.StructField("lon", T.DoubleType()),
            T.StructField("lat", T.DoubleType()),
        ]))),
    ])
    return spark.createDataFrame(rows, schema)


def cover_df(spark: SparkSession, res: int = COVER_RES) -> DataFrame:
    """Exploded (cover_cell, polygon_id, admin_level) prefilter dim.

    Cover sets are computed once driver-side with numpy (the dim is tiny);
    at production scale this is a precomputed broadcast artifact, like the
    reference's grammar bundle shipped to workers (``__init__.py:8-63``)."""
    rows = []
    for p in layers.POLYGONS:
        for c in geometry.cover_cells(p["ring"], res):
            rows.append((int(c), p["polygon_id"], p["admin_level"]))
    schema = T.StructType([
        T.StructField("cover_cell", T.LongType()),
        T.StructField("polygon_id", T.LongType()),
        T.StructField("admin_level", T.IntegerType()),
    ])
    return spark.createDataFrame(rows, schema)


@pandas_udf(T.BooleanType())
def pip_refine_udf(lon: pd.Series, lat: pd.Series, polygon_id: pd.Series) -> pd.Series:
    """Exact ray-cast refine, vectorized per polygon group within the Arrow
    batch (points × edges in one numpy broadcast per polygon)."""
    out = np.zeros(len(lon), dtype=bool)
    px = lon.to_numpy(dtype=np.float64)
    py = lat.to_numpy(dtype=np.float64)
    pid = polygon_id.to_numpy(dtype=np.int64)
    for p in np.unique(pid):
        m = pid == p
        out[m] = geometry.pip_mask(px[m], py[m], _RINGS[int(p)])
    return pd.Series(out)


def pip_join(
    points: DataFrame,
    spark: SparkSession,
    point_res: int = layers.GRID_RES,
    cover_res: int = COVER_RES,
    keys: tuple[str, ...] = ("url",),
) -> DataFrame:
    """points(keys..., lon, lat [, cell]) -> (keys..., cell_id, polygon_id).

    ``cell_id`` is the point's cell at ``point_res``; the prefilter key is
    its ancestor at ``cover_res`` via bit-truncation (parent_col)."""
    if "cell" not in points.columns:
        points = points.withColumn("cell", cells.cell_col(F.col("lon"), F.col("lat"), point_res))
    pts = points.withColumn(
        "cover_cell", cells.parent_col(F.col("cell"), point_res - cover_res)
    )
    cov = cover_df(spark, cover_res)
    cand = pts.join(F.broadcast(cov), "cover_cell", "inner")
    refined = cand.filter(pip_refine_udf(F.col("lon"), F.col("lat"), F.col("polygon_id")))
    return refined.select(
        *keys, F.col("cell").alias("cell_id"), "polygon_id", "admin_level"
    )


def pip_best(joined: DataFrame, keys: tuple[str, ...] = ("url",)) -> DataFrame:
    """Longest-containment winner: deepest admin_level, ties to the smallest
    polygon_id — the ``longest_scope_match`` analogue (c_parser.py:134-140)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys, "cell_id")
        .orderBy(F.col("admin_level").desc(), F.col("polygon_id").asc())
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
