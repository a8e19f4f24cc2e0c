"""DuckDB oracle SQL generators.

Each function returns ANSI SQL (DuckDB dialect) computing the same result as
the corresponding Spark query in ``__spark_entry__.queries()``, over the
pre-registered views (documents, lineitem, ...). Formulas are generated from
the same constants in ``layers.py`` / ``cells.py`` — single source of truth,
exact integer arithmetic, so value hashes match bit-for-bit.
"""

from __future__ import annotations

from . import cells, layers


def _pts_cte(res: int = layers.GRID_RES) -> str:
    """CTE 'pts': deterministic doc points with skew + res-10 cell id."""
    shift = layers.GRID_RES - res
    gx = f"(gx >> {shift})" if shift else "gx"
    gy = f"(gy >> {shift})" if shift else "gy"
    return f"""
pts0 AS (
  SELECT doc_id,
         {layers.DOC_GX_SQL} AS gx,
         {layers.DOC_GY_SQL} AS gy
  FROM documents
),
pts AS (
  SELECT doc_id, gx, gy,
         {layers.LON_SQL.format(gx='gx')} AS lon,
         {layers.LAT_SQL.format(gy='gy')} AS lat,
         {cells.morton_sql(gx, gy, res)} AS cell_id
  FROM pts0
)"""


def _edges_cte() -> str:
    return f"edges AS (SELECT * FROM {layers.polygon_edges_sql_values()} AS e(polygon_id, x1, y1, x2, y2))"


def _admin_cte() -> str:
    return f"admin AS (SELECT * FROM {layers.polygon_admin_sql_values()} AS a(polygon_id, admin_level))"


_CROSSING = (
    "((e.y1 > p.lat) <> (e.y2 > p.lat)) AND "
    "(p.lon < (e.x2 - e.x1) * (p.lat - e.y1) / (e.y2 - e.y1) + e.x1)"
)


def _pts0_only() -> str:
    return f"""
pts0 AS (
  SELECT doc_id,
         {layers.DOC_GX_SQL} AS gx,
         {layers.DOC_GY_SQL} AS gy
  FROM documents
)"""


def cell_encode_sql(res_lo: int = 7, res_hi: int = 10) -> str:
    parts = []
    for r in range(res_lo, res_hi + 1):
        shift = layers.GRID_RES - r
        gx = f"(gx >> {shift})" if shift else "gx"
        gy = f"(gy >> {shift})" if shift else "gy"
        parts.append(
            f"SELECT doc_id, {r} AS res, {cells.morton_sql(gx, gy, r)} AS cell_id FROM pts0"
        )
    return f"WITH {_pts0_only()} " + " UNION ALL ".join(parts)


def pip_docs_sql() -> str:
    """(doc_id, cell_id, polygon_id): every polygon containing each doc point."""
    return f"""
WITH {_pts_cte()}, {_edges_cte()}
SELECT doc_id, cell_id, polygon_id FROM (
  SELECT p.doc_id, p.cell_id, e.polygon_id, count(*) AS c
  FROM pts p JOIN edges e ON ({_CROSSING})
  GROUP BY 1, 2, 3
) WHERE c % 2 = 1
"""


def pip_best_sql() -> str:
    """Deepest-admin-level winner per (doc_id, cell_id) — longest_scope_match."""
    return f"""
WITH {_pts_cte()}, {_edges_cte()}, {_admin_cte()},
hits AS (
  SELECT doc_id, cell_id, polygon_id FROM (
    SELECT p.doc_id, p.cell_id, e.polygon_id, count(*) AS c
    FROM pts p JOIN edges e ON ({_CROSSING})
    GROUP BY 1, 2, 3
  ) WHERE c % 2 = 1
)
SELECT h.doc_id, h.cell_id, h.polygon_id, a.admin_level
FROM hits h JOIN admin a USING (polygon_id)
QUALIFY row_number() OVER (
  PARTITION BY h.doc_id, h.cell_id
  ORDER BY a.admin_level DESC, h.polygon_id ASC
) = 1
"""


def _entities_cte() -> str:
    """CTE 'ent': deterministic reconstruction of the embedded mentions."""
    gi = layers.MENTION_IDX_SQL.format(j="j")
    return f"""
ment AS (
  SELECT doc_id, length(text) AS tlen,
         unnest(generate_series(0, doc_id % 3)) AS j
  FROM documents
),
ent AS (
  SELECT
    printf('https://host%04d.example/doc/%d', (doc_id % 100)::int, doc_id) AS url,
    doc_id,
    j::int AS entity_id,
    printf('GEO_%05d', {gi}) AS surface,
    (tlen + 1 + j * 10)::int AS char_offset,
    {layers.LON_SQL.format(gx=layers.GAZ_GX_SQL.format(i=gi))} AS lon,
    {layers.LAT_SQL.format(gy=layers.GAZ_GY_SQL.format(i=gi))} AS lat
  FROM ment
)"""


def entities_sql() -> str:
    return f"WITH {_entities_cte()} SELECT url, entity_id, surface, char_offset, lon, lat FROM ent"


def pip_entities_sql(res: int = layers.GRID_RES) -> str:
    """The flagship triple set: distinct (url, cell_id, polygon_id) over
    extracted page entities."""
    gi = layers.MENTION_IDX_SQL.format(j="j")
    gx = layers.GAZ_GX_SQL.format(i=gi)
    gy = layers.GAZ_GY_SQL.format(i=gi)
    shift = layers.GRID_RES - res
    gxr = f"(({gx}) >> {shift})" if shift else f"({gx})"
    gyr = f"(({gy}) >> {shift})" if shift else f"({gy})"
    return f"""
WITH ment AS (
  SELECT doc_id, unnest(generate_series(0, doc_id % 3)) AS j FROM documents
),
p AS (
  SELECT
    printf('https://host%04d.example/doc/%d', (doc_id % 100)::int, doc_id) AS url,
    {layers.LON_SQL.format(gx=gx)} AS lon,
    {layers.LAT_SQL.format(gy=gy)} AS lat,
    {cells.morton_sql(gxr, gyr, res)} AS cell_id
  FROM ment
),
{_edges_cte()}
SELECT DISTINCT url, cell_id, polygon_id FROM (
  SELECT p.url, p.cell_id, e.polygon_id, count(*) AS c
  FROM p JOIN edges e ON ({_CROSSING})
  GROUP BY 1, 2, 3
) WHERE c % 2 = 1
"""


def tiles_sql(res_lo: int = 7, res_hi: int = 10) -> str:
    parts = []
    for r in range(res_lo, res_hi + 1):
        shift = layers.GRID_RES - r
        gx = f"(gx >> {shift})" if shift else "gx"
        gy = f"(gy >> {shift})" if shift else "gy"
        parts.append(
            f"SELECT {r} AS res, {cells.morton_sql(gx, gy, r)} AS cell_id, "
            f"count(*) AS n_docs FROM pts0 GROUP BY 1, 2"
        )
    return f"WITH {_pts0_only()} " + " UNION ALL ".join(parts)


def knn_sql(k: int = 5) -> str:
    return f"""
WITH {_pts_cte()}
SELECT doc_id, neighbor_id, rank, dist_sq FROM (
  SELECT a.doc_id, b.doc_id AS neighbor_id,
         (a.lon - b.lon) * (a.lon - b.lon) + (a.lat - b.lat) * (a.lat - b.lat) AS dist_sq,
         row_number() OVER (
           PARTITION BY a.doc_id
           ORDER BY (a.lon - b.lon) * (a.lon - b.lon) + (a.lat - b.lat) * (a.lat - b.lat) ASC,
                    b.doc_id ASC
         ) AS rank
  FROM pts a JOIN pts b ON a.doc_id <> b.doc_id
) WHERE rank <= {k}
"""


def extract_text_sql() -> str:
    """Byte-identity oracle: reconstruct text||mentions directly."""
    pieces = []
    for j in range(3):
        gi = layers.MENTION_IDX_SQL.format(j=str(j))
        pieces.append(
            f"CASE WHEN {j} < 1 + doc_id % 3 THEN ' GEO_' || printf('%05d', {gi}) ELSE '' END"
        )
    concat = " || ".join(pieces)
    return f"""
SELECT printf('https://host%04d.example/doc/%d', (doc_id % 100)::int, doc_id) AS url,
       text || {concat} AS text_out
FROM documents
"""
