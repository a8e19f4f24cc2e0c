"""Vectorized planar geometry: ray-casting point-in-polygon, covers, distance.

The exact-refine stage of the two-phase containment join (SURVEY.md §2.3 row 1;
the analogue of the reference's ``scope_check``, ``codeviews/SDFG/SDFG_c.py:53-68``).

Crossing rule (must stay bit-identical with the SQL oracle — same ops, same
order): edge (x1,y1)->(x2,y2) crosses the rightward ray from (px,py) iff

    ((y1 > py) != (y2 > py)) AND (px < (x2 - x1) * (py - y1) / (y2 - y1) + x1)

Point is inside iff the crossing count is odd. Lon/lat treated as planar
(polygons here never span the antimeridian — documented v0 limitation,
FIXTURES.md §3).
"""

from __future__ import annotations

import numpy as np

from . import cells


def pip_mask(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized ray-cast: points (P,) vs one ring (V,2) of (lon,lat).

    Ring is open (first vertex != last); closure edge added implicitly.
    Returns bool mask (P,).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    ring = np.asarray(ring, dtype=np.float64)
    x1 = ring[:, 0]
    y1 = ring[:, 1]
    x2 = np.roll(x1, -1)
    y2 = np.roll(y1, -1)
    # broadcast: (P, E)
    PY = py[:, None]
    PX = px[:, None]
    straddle = (y1[None, :] > PY) != (y2[None, :] > PY)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = (x2 - x1)[None, :] * (PY - y1[None, :]) / (y2 - y1)[None, :] + x1[None, :]
    cross = straddle & (PX < xint)
    return (cross.sum(axis=1) % 2).astype(bool)


def pip_crossing_sql(px: str, py: str, edges_rel: str) -> str:
    """SQL fragment: correlated crossing-count condition against an edge
    relation ``edges_rel(polygon_id, x1, y1, x2, y2)``. Used by oracles."""
    return (
        f"((({edges_rel}.y1 > {py}) <> ({edges_rel}.y2 > {py})) AND "
        f"({px} < ({edges_rel}.x2 - {edges_rel}.x1) * ({py} - {edges_rel}.y1)"
        f" / ({edges_rel}.y2 - {edges_rel}.y1) + {edges_rel}.x1))"
    )


def ring_bbox(ring) -> tuple[float, float, float, float]:
    r = np.asarray(ring, dtype=np.float64)
    return float(r[:, 0].min()), float(r[:, 1].min()), float(r[:, 0].max()), float(r[:, 1].max())


def cover_cells(ring, res: int) -> np.ndarray:
    """Cell-cover prefilter set: all res-``res`` cells whose bbox intersects
    the polygon's bbox. A strict superset of cells containing any interior
    point — prefilter-safe (false positives removed by the exact refine;
    false negatives impossible). The analogue of the reference's name-equality
    prefilter before ``scope_check`` (``c_parser.py:227-249``)."""
    lon_min, lat_min, lon_max, lat_max = ring_bbox(ring)
    n = 1 << res
    x0 = max(0, min(n - 1, int(np.floor((lon_min + 180.0) / 360.0 * n))))
    x1 = max(0, min(n - 1, int(np.floor((lon_max + 180.0) / 360.0 * n))))
    y0 = max(0, min(n - 1, int(np.floor((lat_min + 90.0) / 180.0 * n))))
    y1 = max(0, min(n - 1, int(np.floor((lat_max + 90.0) / 180.0 * n))))
    xs, ys = np.meshgrid(np.arange(x0, x1 + 1, dtype=np.int64),
                         np.arange(y0, y1 + 1, dtype=np.int64))
    return cells.morton_np(xs.ravel(), ys.ravel(), res)


def sq_dist(ax: np.ndarray, ay: np.ndarray, bx: np.ndarray, by: np.ndarray) -> np.ndarray:
    """Squared planar degree distance — deterministic (only *,+,-; no trig),
    used for kNN ordering so the DuckDB oracle reproduces it bit-for-bit.
    (Haversine is provided separately for real-world use; its trig is
    platform-ULP-sensitive so it is not part of the correctness contract.)"""
    dx = ax - bx
    dy = ay - by
    return dx * dx + dy * dy


def haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Great-circle metres (numpy). For production ranking at real scale."""
    r = 6371000.0
    p1 = np.radians(np.asarray(lat1, dtype=np.float64))
    p2 = np.radians(np.asarray(lat2, dtype=np.float64))
    dp = p2 - p1
    dl = np.radians(np.asarray(lon2, dtype=np.float64) - np.asarray(lon1, dtype=np.float64))
    a = np.sin(dp / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2) ** 2
    return 2 * r * np.arcsin(np.sqrt(a))
