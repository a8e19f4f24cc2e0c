"""Hierarchical cell index (Morton/Z-order quadkey over lon/lat).

Stands in for H3/S2 (neither library ships in this container). Keeps the two
properties the engine needs, the same properties the reference gets from its
scope stacks (SURVEY.md §1.1.4; reference ``tree_parser/c_parser.py:127-140``):

1. **Hierarchical containment by prefix**: the res-(r-1) parent of a res-r
   cell is ``cell_id >> 2`` — pure integer truncation, the analogue of
   scope-path prefix-subset (``scope_check``). No array ops, no joins.
2. **Spatial locality**: Morton interleaving means nearby cells share high
   bits, so ``repartitionByRange(cell_id)`` clusters space (Z-order layout).

Grid: at resolution r the world (lon in [-180,180), lat in [-90,90)) is a
2^r x 2^r grid. ``x`` indexes lon (low interleaved bits), ``y`` indexes lat.
``cell_id`` at res r is the 2r-bit Morton code of (x, y); res is carried in a
separate column (like H3's resolution nibble, kept separate for cheap SQL).

Three implementations, all bit-for-bit identical:
- numpy (vectorized, for pandas-UDF paths and oracles),
- Spark Column expressions (JVM-side, whole-stage-codegen'd — the hot path),
- ANSI-SQL string generator (for the DuckDB correctness oracle).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_RES = 15  # 2^15 x 2^15 ≈ 1.1 km x 0.6 km cells at the equator — plenty


# ---------------------------------------------------------------------------
# numpy reference implementation
# ---------------------------------------------------------------------------

def xy_from_lonlat(lon: np.ndarray, lat: np.ndarray, res: int):
    """Integer grid coords at resolution ``res``. Clamped to the grid."""
    n = 1 << res
    x = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    y = np.floor((lat + 90.0) / 180.0 * n).astype(np.int64)
    np.clip(x, 0, n - 1, out=x)
    np.clip(y, 0, n - 1, out=y)
    return x, y


def morton_np(x: np.ndarray, y: np.ndarray, res: int) -> np.ndarray:
    """Interleave bits: x -> even bit positions, y -> odd."""
    m = np.zeros_like(x, dtype=np.int64)
    for i in range(res):
        m |= ((x >> i) & 1) << (2 * i)
        m |= ((y >> i) & 1) << (2 * i + 1)
    return m


def morton_decode_np(cell: np.ndarray, res: int):
    x = np.zeros_like(cell, dtype=np.int64)
    y = np.zeros_like(cell, dtype=np.int64)
    for i in range(res):
        x |= ((cell >> (2 * i)) & 1) << i
        y |= ((cell >> (2 * i + 1)) & 1) << i
    return x, y


def cell_from_lonlat_np(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    x, y = xy_from_lonlat(np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64), res)
    return morton_np(x, y, res)


def parent_np(cell: np.ndarray, steps: int = 1) -> np.ndarray:
    """Parent cell ``steps`` resolutions coarser — pure truncation."""
    return cell >> (2 * steps)


def children_np(cell: int, res_from: int, res_to: int) -> np.ndarray:
    """All descendant cells of ``cell`` (at res_from) at finer res_to."""
    k = 2 * (res_to - res_from)
    base = np.int64(cell) << k
    return base + np.arange(1 << k, dtype=np.int64)


def cell_center_lonlat(cell: np.ndarray, res: int):
    x, y = morton_decode_np(np.asarray(cell, dtype=np.int64), res)
    n = 1 << res
    lon = -180.0 + 360.0 * (x + 0.5) / n
    lat = -90.0 + 180.0 * (y + 0.5) / n
    return lon, lat


def cell_bounds(cell: int, res: int):
    """(lon_min, lat_min, lon_max, lat_max) of one cell."""
    x, y = morton_decode_np(np.asarray([cell], dtype=np.int64), res)
    n = 1 << res
    return (
        -180.0 + 360.0 * x[0] / n,
        -90.0 + 180.0 * y[0] / n,
        -180.0 + 360.0 * (x[0] + 1) / n,
        -90.0 + 180.0 * (y[0] + 1) / n,
    )


def ring_cells_np(x: np.ndarray, y: np.ndarray, res: int, t: int) -> np.ndarray:
    """For each (x,y): Morton ids of the ring at Chebyshev distance exactly t.

    Returns shape (len(x), 8t) for t>0, (len(x), 1) for t==0. Cells off the
    grid edge are returned as -1 (callers filter).
    ``kRing(t)`` (H3 vocabulary) = union of rings 0..t.
    """
    n = 1 << res
    if t == 0:
        offs = [(0, 0)]
    else:
        offs = []
        for dx in range(-t, t + 1):
            for dy in (-t, t):
                offs.append((dx, dy))
        for dy in range(-t + 1, t):
            for dx in (-t, t):
                offs.append((dx, dy))
    out = np.empty((len(x), len(offs)), dtype=np.int64)
    for j, (dx, dy) in enumerate(offs):
        xx = x + dx
        yy = y + dy
        ok = (xx >= 0) & (xx < n) & (yy >= 0) & (yy < n)
        m = morton_np(np.clip(xx, 0, n - 1), np.clip(yy, 0, n - 1), res)
        out[:, j] = np.where(ok, m, -1)
    return out


def compact_cells_np(cells: np.ndarray, res: int) -> list[tuple[int, int]]:
    """H3-`compact`-style: replace any 4 complete siblings by their parent,
    recursively. Input: unique res-r cells. Output: list of (res, cell)."""
    out: list[tuple[int, int]] = []
    cur = np.unique(np.asarray(cells, dtype=np.int64))
    r = res
    while r > 0 and len(cur):
        parents, counts = np.unique(cur >> 2, return_counts=True)
        full = parents[counts == 4]
        if len(full) == 0:
            out.extend((r, int(c)) for c in cur)
            break
        full_set = set(full.tolist())
        keep = cur[~np.isin(cur >> 2, full)]
        out.extend((r, int(c)) for c in keep)
        cur = np.fromiter(full_set, dtype=np.int64, count=len(full_set))
        cur.sort()
        r -= 1
    else:
        out.extend((r, int(c)) for c in cur)
    return out


# ---------------------------------------------------------------------------
# Spark Column expressions (JVM-side — the hot path; no Python per row)
# ---------------------------------------------------------------------------

# --- SQL-text twins (plan-build latency) -----------------------------------
#
# Building these expression trees through the Column API costs 2-4 py4j
# round trips per operator — ~80-160 per morton_col call, measured ~0.1-0.15s
# of DRIVER time per call site per plan build (the simhash_df /
# pip_refine_expr finding). The twins build the IDENTICAL operator tree as
# one SQL string in pure Python (one py4j round trip at F.expr); double
# literals carry the D suffix so Spark does not parse them as DECIMAL.
# Args are SQL text (a column name or any SQL expression).

def morton_sql(x: str, y: str, res: int) -> str:
    terms = ["cast(0 as bigint)"]
    for i in range(res):
        terms.append(f"shiftleft((shiftright({x}, {i}) & 1), {2 * i})")
        terms.append(f"shiftleft((shiftright({y}, {i}) & 1), {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def x_sql(lon: str, res: int) -> str:
    n = 1 << res
    return (f"greatest(0, least({n - 1}, "
            f"cast(floor((({lon}) + 180.0D) / 360.0D * {float(n)!r}D) as bigint)))")


def y_sql(lat: str, res: int) -> str:
    n = 1 << res
    return (f"greatest(0, least({n - 1}, "
            f"cast(floor((({lat}) + 90.0D) / 180.0D * {float(n)!r}D) as bigint)))")


def cell_sql(lon: str, lat: str, res: int) -> str:
    return morton_sql(x_sql(lon, res), y_sql(lat, res), res)


def x_from_cell_sql(cell: str, res: int) -> str:
    terms = ["cast(0 as bigint)"]
    for i in range(res):
        terms.append(f"shiftleft((shiftright({cell}, {2 * i}) & 1), {i})")
    return "(" + " | ".join(terms) + ")"


def y_from_cell_sql(cell: str, res: int) -> str:
    terms = ["cast(0 as bigint)"]
    for i in range(res):
        terms.append(f"shiftleft((shiftright({cell}, {2 * i + 1}) & 1), {i})")
    return "(" + " | ".join(terms) + ")"


def x_col(lon: Column, res: int) -> Column:
    n = 1 << res
    raw = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n))).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), raw))


def y_col(lat: Column, res: int) -> Column:
    n = 1 << res
    raw = F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(n))).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), raw))


def morton_col(x: Column, y: Column, res: int) -> Column:
    """Morton interleave as a pure bit-op expression tree (codegen-friendly)."""
    m = F.lit(0).cast("long")
    for i in range(res):
        m = m.bitwiseOR(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        m = m.bitwiseOR(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return m


def cell_col(lon: Column, lat: Column, res: int) -> Column:
    return morton_col(x_col(lon, res), y_col(lat, res), res)


def parent_col(cell: Column, steps: int = 1) -> Column:
    return F.shiftright(cell, 2 * steps)


def x_from_cell_col(cell: Column, res: int) -> Column:
    """De-interleave even bits (inverse of morton_col; JVM-side bit ops)."""
    x = F.lit(0).cast("long")
    for i in range(res):
        x = x.bitwiseOR(F.shiftleft(F.shiftright(cell, 2 * i).bitwiseAND(F.lit(1)), i))
    return x


def y_from_cell_col(cell: Column, res: int) -> Column:
    y = F.lit(0).cast("long")
    for i in range(res):
        y = y.bitwiseOR(F.shiftleft(F.shiftright(cell, 2 * i + 1).bitwiseAND(F.lit(1)), i))
    return y


def lon_center_col(x: Column, res: int) -> Column:
    n = 1 << res
    return F.lit(-180.0) + F.lit(360.0) * (x.cast("double") + F.lit(0.5)) / F.lit(float(n))


def lat_center_col(y: Column, res: int) -> Column:
    n = 1 << res
    return F.lit(-90.0) + F.lit(180.0) * (y.cast("double") + F.lit(0.5)) / F.lit(float(n))


# ---------------------------------------------------------------------------
# ANSI-SQL generator (DuckDB oracle side)
# ---------------------------------------------------------------------------

def morton_sql(x_expr: str, y_expr: str, res: int) -> str:
    """SQL expression computing the same Morton code as morton_np/morton_col."""
    terms = []
    for i in range(res):
        terms.append(f"((({x_expr} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y_expr} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def x_from_cell_sql(cell_expr: str, res: int) -> str:
    terms = [f"((({cell_expr} >> {2 * i}) & 1) << {i})" for i in range(res)]
    return "(" + " | ".join(terms) + ")"


def y_from_cell_sql(cell_expr: str, res: int) -> str:
    terms = [f"((({cell_expr} >> {2 * i + 1}) & 1) << {i})" for i in range(res)]
    return "(" + " | ".join(terms) + ")"


# ---------------------------------------------------------------------------
# geohash (Niemeyer base32) — shared by the Spark encode and the DuckDB
# oracle; a geohash is the Morton interleave with lon on the LEADING bit,
# chunked into 5-bit base32 characters.
# ---------------------------------------------------------------------------

GEOHASH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_char_sql(g_expr: str, k: int, precision: int = 4) -> str:
    """SQL for the k-th base32 char of a (5*precision)-bit interleave —
    identical text under Spark SQL and DuckDB (both substr() 1-based)."""
    shift = 5 * (precision - 1 - k)
    return f"substr('{GEOHASH_B32}', CAST(({g_expr} >> {shift}) % 32 AS INT) + 1, 1)"


def quadtree_decompose(
    x0: int, y0: int, x1: int, y1: int, max_res: int = 10
) -> list[tuple[int, int]]:
    """Exact quadtree decomposition of an inclusive integer rectangle into
    maximal pyramid cells: returns (res, cell_id) pairs — cell_id is the
    SAME Morton id `geo_tile_pyramid` aggregates at that res — whose cells
    are pairwise disjoint and cover the rectangle exactly. O(perimeter)
    cells (each recursion level contributes a ring of at most O(side/s)
    partially-covered cells). Pure-int driver-side helper for DIM-SIZED
    rectangle sets only: the decomposition list is broadcast, never
    computed per corpus row.

    Memoized (pure integer function of its arguments — the recursion is
    ~4k Python calls per rectangle, 0.45 s per geo_range_count plan build
    over its fixed 64-rect query set); a fresh copy is returned so callers
    may mutate."""
    key = (x0, y0, x1, y1, max_res)
    hit = _QUADTREE_MEMO.get(key)
    if hit is not None:
        return list(hit)
    out: list[tuple[int, int]] = []

    def rec(res: int, cx: int, cy: int) -> None:
        s = 1 << (max_res - res)
        lox, hix = cx * s, cx * s + s - 1
        loy, hiy = cy * s, cy * s + s - 1
        if lox > x1 or hix < x0 or loy > y1 or hiy < y0:
            return
        if lox >= x0 and hix <= x1 and loy >= y0 and hiy <= y1:
            # scalar morton (a 1-element-array morton_np call per cell is
            # ~100x slower than this loop over plain ints)
            m = 0
            for i in range(res):
                m |= ((cx >> i) & 1) << (2 * i)
                m |= ((cy >> i) & 1) << (2 * i + 1)
            out.append((res, m))
            return
        for dx in (0, 1):
            for dy in (0, 1):
                rec(res + 1, 2 * cx + dx, 2 * cy + dy)

    rec(0, 0, 0)
    _QUADTREE_MEMO[key] = tuple(out)
    return out


_QUADTREE_MEMO: dict = {}
