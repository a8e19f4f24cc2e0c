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
from ..localdf import arrow_local_df

from .. import cells, geometry, layers

# Prefilter grid: 64x64 world cells. Finer cover = fewer false candidates
# reaching the exact refine (measured ~25% less join work than res 4 on the
# built-in layer) while the exploded cover dim stays ~1k rows — broadcast
# noise either way. The knob trades dim size vs refine work; res 6 is the
# sweet spot for continent-scale polygons.
COVER_RES = 6

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
    """Exploded (cover_cell, polygon_id, admin_level, full) prefilter dim.

    ``full`` marks interior cells (whole cell ⊆ polygon): candidates landing
    there skip the exact refine — only boundary cells (O(perimeter)) pay for
    ray-casting. Cover sets are computed once driver-side with numpy (the
    dim is tiny); at production scale this is a precomputed broadcast
    artifact, like the reference's grammar bundle shipped to workers
    (``__init__.py:8-63``)."""
    rows = []
    for p in layers.POLYGONS:
        cs, full = geometry.cover_cells_classified(p["ring"], res)
        for c, f in zip(cs, full):
            rows.append((int(c), p["polygon_id"], p["admin_level"], bool(f)))
    return arrow_local_df(
        spark, rows,
        "cover_cell long, polygon_id long, admin_level int, full boolean",
    )


@pandas_udf(T.BooleanType())
def pip_refine_udf(lon: pd.Series, lat: pd.Series, polygon_id: pd.Series) -> pd.Series:
    """Exact ray-cast refine, vectorized per polygon group within the Arrow
    batch. The general-layer path: works for any ring table (including ones
    too large to bake into an expression)."""
    out = np.zeros(len(lon), dtype=bool)
    px = lon.to_numpy(dtype=np.float64)
    py = lat.to_numpy(dtype=np.float64)
    pid = polygon_id.to_numpy(dtype=np.int64)
    for p in np.unique(pid):
        m = pid == p
        out[m] = geometry.pip_mask(px[m], py[m], _RINGS[int(p)])
    return pd.Series(out)


def _d(x: float) -> str:
    """Exact double literal for SQL text: repr round-trips IEEE doubles and
    the D suffix keeps Spark from parsing the literal as DECIMAL."""
    return f"{x!r}D"


def pip_refine_expr(lon: str = "lon", lat: str = "lat",
                    polygon_id: str = "polygon_id"):
    """Exact ray-cast refine as a PURE JVM expression (whole-stage codegen,
    zero Python on the hot path).

    The polygon layer is small and literal, so the crossing parity unrolls
    into a CASE over polygon_id of XOR-chained (boolean !=) edge tests with
    literal coefficients — bit-identical to ``geometry.pip_mask`` and the
    DuckDB oracle (same expression shape, same FP op order). Division by a
    zero (horizontal edge) yields Inf/NaN whose comparison is false, exactly
    matching the numpy errstate-masked path.

    Measured vs the Arrow UDF on 5M rows: the UDF path anti-scales in local
    mode at high thread counts (JVM task threads + Python workers > CPUs);
    the expression path stays inside codegen and scales with cores.

    Built as ONE SQL text expression (F.expr) instead of per-edge Column
    operators: the Column-builder construction was ~6,300 py4j round trips
    = ~1.1 s of DRIVER time per plan build (profiled via cProfile on
    geo_region_centroids — the same finding as simhash_df's SQL-text
    rewrite), identical operators either way. Args are column NAMES."""
    result = "false"
    for p in layers.POLYGONS:
        ring = p["ring"]
        nv = len(ring)
        parity = None
        for k in range(nv):
            x1, y1 = float(ring[k][0]), float(ring[k][1])
            x2, y2 = float(ring[(k + 1) % nv][0]), float(ring[(k + 1) % nv][1])
            straddle = f"(({_d(y1)} > {lat}) != ({_d(y2)} > {lat}))"
            xint = (f"(({_d(x2 - x1)} * ({lat} - {_d(y1)}) / {_d(y2 - y1)})"
                    f" + {_d(x1)})")
            cross = f"({straddle} AND ({lon} < {xint}))"
            parity = cross if parity is None else f"({parity} != {cross})"
        result = (f"CASE WHEN ({polygon_id} = {p['polygon_id']}L) "
                  f"THEN {parity} ELSE {result} END")
    return F.expr(result)


def pip_join(
    points: DataFrame,
    spark: SparkSession,
    point_res: int = layers.GRID_RES,
    cover_res: int = COVER_RES,
    keys: tuple[str, ...] = ("url",),
    refine: str = "jvm",
) -> DataFrame:
    """points(keys..., lon, lat [, cell]) -> (keys..., cell_id, polygon_id).

    ``cell_id`` is the point's cell at ``point_res``; the prefilter key is
    its ancestor at ``cover_res`` via bit-truncation (parent_col).
    ``refine``: "jvm" (codegen expression — the hot path for a literal
    layer) or "udf" (Arrow-vectorized numpy — arbitrary ring tables).
    Both are bit-identical to the oracle."""
    if "cell" not in points.columns:
        points = points.withColumn("cell", F.expr(cells.cell_sql("lon", "lat", point_res)))
    pts = points.withColumn(
        "cover_cell", cells.parent_col(F.col("cell"), point_res - cover_res)
    )
    cov = cover_df(spark, cover_res)
    cand = pts.join(F.broadcast(cov), "cover_cell", "inner")
    refine_col = (
        pip_refine_expr("lon", "lat", "polygon_id") if refine == "jvm"
        else pip_refine_udf(F.col("lon"), F.col("lat"), F.col("polygon_id"))
    )
    # interior cells short-circuit the exact test (cell ⊆ polygon); only
    # boundary candidates evaluate the ray-cast
    refined = cand.filter(F.col("full") | refine_col)
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
