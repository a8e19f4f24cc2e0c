"""S2-style Hilbert-curve cell index (levels 12-16).

S2's cell ids are positions along a Hilbert space-filling curve; this module
implements the same construction over the engine's lon/lat grid (one face —
polygons here never span the antimeridian, FIXTURES.md §3). It is the second
index family next to the Morton quadkey in ``cells.py`` (the H3 stand-in),
mirroring the north rule's dual H3-res-7-10 / S2-level-12-16 encode.

Like the reference's scope stacks (``tree_parser/c_parser.py:127-140``), the
index is hierarchical-by-prefix: the level-(l-1) parent of a level-l cell is
``cell >> 2`` (the Hilbert curve is self-similar, so truncation == parent).
Unlike Morton, consecutive Hilbert ids are always spatially adjacent, which
is why it is also the engine's z-order *repartitioning* key (``skew.py``):
``repartitionByRange(hilbert)`` gives contiguous spatial tiles per partition
with no long-range jumps.

Three bit-identical implementations (same discipline as ``cells.py``):
numpy (vectorized — the pandas-UDF hot path, per the north rule's
"vectorized pandas/Arrow UDFs"), a pandas UDF wrapper, and a DuckDB SQL
generator (an unrolled per-level CTE chain) for the correctness oracle.

Algorithm: the standard iterative xy->d Hilbert transform (public domain,
en.wikipedia.org/wiki/Hilbert_curve#Applications_and_mapping_algorithms),
MSB-first digit accumulation with quadrant rotation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

S2_RES = 16           # finest level computed; coarser levels by truncation
S2_LEVELS = (12, 13, 14, 15, 16)


# ---------------------------------------------------------------------------
# numpy (vectorized reference + UDF kernel)
# ---------------------------------------------------------------------------

def hilbert_np(x: np.ndarray, y: np.ndarray, res: int) -> np.ndarray:
    """Hilbert curve index of grid cells (x, y) on the 2^res x 2^res grid."""
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    n = np.int64(1) << res
    d = np.zeros_like(x)
    s = n >> 1
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant so the sub-curve is oriented canonically
        flip = (ry == 0) & (rx == 1)
        xf = np.where(flip, n - 1 - x, x)
        yf = np.where(flip, n - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, yf, xf), np.where(swap, xf, yf)
        s >>= 1
    return d


def hilbert_parent_np(cell: np.ndarray, steps: int = 1) -> np.ndarray:
    """Hilbert is self-similar: parent = truncation, same as Morton."""
    return np.asarray(cell, dtype=np.int64) >> (2 * steps)


# ---------------------------------------------------------------------------
# Spark surface: vectorized pandas UDF (Arrow-batched; zero per-row Python)
# ---------------------------------------------------------------------------

def hilbert_udf(res: int = S2_RES):
    """pandas UDF (gx, gy at ``res``) -> hilbert cell id (long)."""

    @pandas_udf(T.LongType())
    def _h(gx: pd.Series, gy: pd.Series) -> pd.Series:
        out = hilbert_np(gx.to_numpy(dtype=np.int64), gy.to_numpy(dtype=np.int64), res)
        return pd.Series(out)

    return _h


def hilbert_at_level_col(h_finest: Column, level: int, finest: int = S2_RES) -> Column:
    return F.shiftright(h_finest, 2 * (finest - level))


def upscale_grid_col(g: Column, from_res: int, to_res: int) -> Column:
    """Grid coord of the *center* of a from_res cell on the to_res grid —
    exact int arithmetic (matches the SQL oracle bit-for-bit)."""
    k = to_res - from_res
    return F.shiftleft(g, k) + F.lit(1 << (k - 1)) if k > 0 else g


def upscale_grid_np(g: np.ndarray, from_res: int, to_res: int) -> np.ndarray:
    k = to_res - from_res
    g = np.asarray(g, dtype=np.int64)
    return (g << k) + (1 << (k - 1)) if k > 0 else g


# ---------------------------------------------------------------------------
# DuckDB oracle SQL: unrolled per-level CTE chain
# ---------------------------------------------------------------------------

def hilbert_cte_chain_sql(
    src_cte: str,
    key_cols: str,
    x_expr: str,
    y_expr: str,
    res: int,
    out_cte: str = "hfin",
) -> str:
    """CTE chain computing the same Hilbert index as ``hilbert_np``.

    ``src_cte`` must expose ``key_cols`` plus expressions ``x_expr``/``y_expr``
    (grid coords at ``res``). The final CTE ``out_cte`` has (key_cols, d).
    One CTE per level keeps every expression bounded (no exponential
    expression-tree blowup — the reason the Spark side uses the numpy UDF).
    """
    n = 1 << res
    parts = [
        f"h{res} AS (SELECT {key_cols}, CAST({x_expr} AS BIGINT) AS x, "
        f"CAST({y_expr} AS BIGINT) AS y, CAST(0 AS BIGINT) AS d FROM {src_cte})"
    ]
    prev = f"h{res}"
    for i in range(res - 1, -1, -1):
        s = 1 << i
        rx = f"(CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)"
        term = f"CAST({s} AS BIGINT) * {s} * xor(3 * {rx}, {ry})"
        flip = f"({ry} = 0 AND {rx} = 1)"
        xf = f"(CASE WHEN {flip} THEN {n - 1} - x ELSE x END)"
        yf = f"(CASE WHEN {flip} THEN {n - 1} - y ELSE y END)"
        newx = f"(CASE WHEN {ry} = 0 THEN {yf} ELSE x END)"
        newy = f"(CASE WHEN {ry} = 0 THEN {xf} ELSE y END)"
        name = f"h{i}" if i > 0 else out_cte
        parts.append(
            f"{name} AS (SELECT {key_cols}, {newx} AS x, {newy} AS y, "
            f"d + {term} AS d FROM {prev})"
        )
        prev = name
    return ",\n".join(parts)
