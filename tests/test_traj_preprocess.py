"""Trajectory-preprocessing wave: speed-gate, resampling, and occupancy
invariants beyond the DuckDB twin (which test_entry_gate already runs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tree_sitter_codeviews_spark import queries as q

SF = "/root/testdata/sf0.001"


def test_outliers_satisfy_speed_gate(spark):
    out = q.events_traj_outliers(spark, SF).toPandas()
    assert len(out) > 0
    assert (out["dist"] * 86400 > q.TRAJ_MAX_PX_PER_DAY * out["dt"]).all()
    # zero-dt ties with movement must flag (the division-free edge case)
    assert (out["dt"] >= 0).all()


def test_resample_grid_and_bounds(spark):
    pts = q.events_traj_resample(spark, SF)
    pdf = pts.toPandas()
    assert len(pdf) > 0
    # every synthetic point sits exactly on the resample grid
    assert (pdf["t_sec"] % q.RESAMPLE_STEP == 0).all()
    # interpolation never leaves the res-10 grid (it is bounded by its
    # endpoints, which are grid coords)
    for c in ("x", "y"):
        assert pdf[c].between(0, 1023).all()
    # boundary sets of consecutive hops are disjoint half-open intervals,
    # so (user, t_sec) is unique
    assert not pdf.duplicated(["user_id", "t_sec"]).any()


def test_occupancy_consistent_with_dwell(spark):
    """Total pings in the hourly occupancy rollup == total containment
    hits in the dwell rollup (same join, different group key)."""
    occ = (
        q.events_geofence_occupancy(spark, SF)
        .agg(F.sum("n_pings").alias("s"))
        .collect()[0]["s"]
    )
    dwell = (
        q.events_geofence_dwell(spark, SF)
        .agg(F.sum("n_pings").alias("s"))
        .collect()[0]["s"]
    )
    assert occ == dwell > 0
    # occupancy distinct-user counts are bounded by ping counts
    bad = (
        q.events_geofence_occupancy(spark, SF)
        .filter(F.col("n_users") > F.col("n_pings"))
        .count()
    )
    assert bad == 0
