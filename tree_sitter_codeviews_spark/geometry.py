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
    # Per-edge 1-D streams, XOR-accumulated parity. A (P, E) broadcast matrix
    # is ~E x more temp memory traffic; on bandwidth-limited hosts (measured:
    # 4x procs -> only 1.6x numpy throughput on this box) the 1-D form keeps
    # the refine compute-bound. E is tiny (<= 6 here), so the Python edge
    # loop costs nothing.
    inside = np.zeros(len(px), dtype=bool)
    nv = len(ring)
    with np.errstate(divide="ignore", invalid="ignore"):
        for k in range(nv):
            x1, y1 = ring[k, 0], ring[k, 1]
            x2, y2 = ring[(k + 1) % nv, 0], ring[(k + 1) % nv, 1]
            straddle = (y1 > py) != (y2 > py)
            xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
            inside ^= straddle & (px < xint)
    return inside


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


def _segment_intersects_rects(
    x1: float, y1: float, x2: float, y2: float,
    X0: np.ndarray, Y0: np.ndarray, X1: np.ndarray, Y1: np.ndarray,
) -> np.ndarray:
    """Liang-Barsky: does segment (x1,y1)-(x2,y2) intersect each axis-aligned
    rect [X0,X1]x[Y0,Y1]? Vectorized over rects."""
    n = len(X0)
    t0 = np.zeros(n)
    t1 = np.ones(n)
    ok = np.ones(n, dtype=bool)
    dx = x2 - x1
    dy = y2 - y1
    for p, q in ((-dx, x1 - X0), (dx, X1 - x1), (-dy, y1 - Y0), (dy, Y1 - y1)):
        if p == 0.0:
            ok &= q >= 0  # parallel and outside this boundary -> no hit
        else:
            t = q / p
            if p < 0:
                t0 = np.maximum(t0, t)
            else:
                t1 = np.minimum(t1, t)
    return ok & (t0 <= t1)


def cover_cells_classified(ring, res: int):
    """Cover set split into (cells, full): ``full[i]`` is True iff the whole
    cell lies inside the polygon — every one of its corners is inside and no
    polygon edge intersects the cell rectangle.

    The interior/boundary split is the scale lever of the containment join:
    candidates landing in *full* cells need NO exact refine (cell ⊆ polygon
    implies point ∈ polygon); only boundary cells — O(perimeter), not
    O(area) — pay for ray-casting. Same idea as H3 polyfill's full-cell
    optimization / prepared geometries in PostGIS."""
    cells_ = cover_cells(ring, res)
    r = np.asarray(ring, dtype=np.float64)
    n = 1 << res
    from .cells import morton_decode_np

    cx, cy = morton_decode_np(cells_, res)
    X0 = -180.0 + 360.0 * cx / n
    X1 = -180.0 + 360.0 * (cx + 1) / n
    Y0 = -90.0 + 180.0 * cy / n
    Y1 = -90.0 + 180.0 * (cy + 1) / n

    corners_inside = np.ones(len(cells_), dtype=bool)
    for gx, gy in ((X0, Y0), (X0, Y1), (X1, Y0), (X1, Y1)):
        corners_inside &= pip_mask(gx, gy, r)

    edge_hits = np.zeros(len(cells_), dtype=bool)
    nv = len(r)
    for k in range(nv):
        x1, y1 = r[k, 0], r[k, 1]
        x2, y2 = r[(k + 1) % nv, 0], r[(k + 1) % nv, 1]
        edge_hits |= _segment_intersects_rects(x1, y1, x2, y2, X0, Y0, X1, Y1)

    return cells_, corners_inside & ~edge_hits


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
