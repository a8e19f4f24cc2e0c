"""IDW surface + nearest-facility: scalar references and the joinless-plan
contract (the whole point of the literal-array HOF design)."""

from __future__ import annotations

import duckdb
import numpy as np

from tree_sitter_codeviews_spark import layers, queries as q

SF = "/root/testdata/sf0.001"


def _stations():
    out = []
    for i in range(0, layers.N_GAZ, q.STATION_MOD):
        out.append((i, (i * 37 + 11) % 1024, (i * 73 + 29) % 1024, (i * 97 + 13) % 1000))
    return out


def test_idw_vs_scalar_reference(spark):
    got = (
        q.geo_idw_surface(spark, SF)
        .toPandas()
        .set_index(["cx", "cy"])
        .sort_index()
    )
    cells = duckdb.sql(f"""
        SELECT DISTINCT ({layers.EVT_GX_SQL}) >> {q.TRAJSIM_SHIFT} AS cx,
                        ({layers.EVT_GY_SQL}) >> {q.TRAJSIM_SHIFT} AS cy
        FROM read_parquet('{SF}/events.parquet')
    """).df()
    side = 1 << q.TRAJSIM_SHIFT
    n_checked = 0
    for r in cells.itertuples():
        px, py = r.cx * side + side // 2, r.cy * side + side // 2
        num = den = cnt = 0
        for _, fx, fy, v in _stations():
            d2 = (px - fx) ** 2 + (py - fy) ** 2
            if d2 <= q.IDW_R2:
                w = q.IDW_WSCALE // max(d2, 1)
                num += v * w
                den += w
                cnt += 1
        key = (r.cx, r.cy)
        if cnt == 0:
            assert key not in got.index
        else:
            row = got.loc[key]
            assert row["n_stations"] == cnt and row["est"] == num // den
            n_checked += 1
    assert n_checked > 0


def test_nearest_facility_partitions_corpus(spark):
    pdf = q.geo_nearest_facility(spark, SF).toPandas()
    total = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert pdf["n_pings"].sum() == total  # every ping assigned exactly once
    assert (pdf["mean_d2"] <= pdf["max_d2"]).all()
    # spot-check the packed argmin on a few pings
    eid = duckdb.sql(
        f"SELECT event_id FROM read_parquet('{SF}/events.parquet') LIMIT 20"
    ).df()["event_id"].to_numpy(np.int64)
    ex, ey = layers.evt_grid_xy_np(eid)
    st = _stations()
    for j in range(len(eid)):
        best = min(
            ((ex[j] - fx) ** 2 + (ey[j] - fy) ** 2, sid) for sid, fx, fy, _ in st
        )
        # the station must exist in the rollup with max_d2 >= this distance
        row = pdf[pdf["station_id"] == best[1]]
        assert len(row) == 1 and row.iloc[0]["max_d2"] >= best[0]


def test_idw_and_facility_plans_are_joinless(spark):
    """The station dim rides in the expression: the physical plan must have
    ZERO join operators — scan, project (HOF), aggregate only."""
    for fn in (q.geo_idw_surface, q.geo_nearest_facility):
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__


def test_voronoi_edges_separate_different_owners(spark):
    """Boundary rows genuinely separate different owners; interior cells
    (all listed neighbors same owner) never appear; the boundary is
    non-empty and smaller than the grid."""
    pdf = q.geo_voronoi_edges(spark, SF).toPandas()
    assert 0 < len(pdf) < 1024
    diff_e = (pdf["east_station"] != -1) & (pdf["east_station"] != pdf["station_id"])
    diff_s = (pdf["south_station"] != -1) & (pdf["south_station"] != pdf["station_id"])
    assert (diff_e | diff_s).all()
    # owners come from the real station id space
    import numpy as np

    sids = {s[0] for s in _stations()}
    assert set(pdf["station_id"]) <= sids


def test_route_friction_grounded(spark):
    """friction >= n_cells (every visited cell has density >= 1 — the
    user's own pings are part of the corpus density)."""
    pdf = q.geo_route_friction(spark, SF).toPandas()
    assert len(pdf) > 0
    assert (pdf["friction"] >= pdf["n_cells"]).all()
    assert (pdf["max_cell_density"] >= 1).all()
