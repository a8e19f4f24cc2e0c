"""Mobility-analytics wave: value-range and consistency invariants beyond
the DuckDB twin (test_entry_gate runs the twin)."""

from __future__ import annotations

import datetime

import duckdb
from pyspark.sql import functions as F

from tree_sitter_codeviews_spark import queries as q

SF = "/root/testdata/sf0.001"


def test_mobility_profile_invariants(spark):
    pdf = q.events_mobility_profile(spark, SF).toPandas()
    assert len(pdf) > 0
    # rg^2 numerator is n^2 * a variance — never negative
    assert (pdf["rg2_num"] >= 0).all()
    # HHI is bounded: 1e6/n_cells <= hhi <= 1e6 (equality iff one cell),
    # modulo the integer floor on the lower bound
    assert (pdf["hhi_ppm"] <= 1_000_000).all()
    assert (pdf["hhi_ppm"] * pdf["n_cells"] >= 1_000_000 - pdf["n_cells"]).all()
    assert (pdf["n_cells"] <= pdf["n_pings"]).all()
    assert (pdf["min_x"] <= pdf["max_x"]).all()
    assert (pdf["min_y"] <= pdf["max_y"]).all()


def test_tile_rhythms_partition_of_corpus(spark):
    pdf = q.geo_tile_rhythms(spark, SF).toPandas()
    total = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert pdf["n_pings"].sum() == total
    assert pdf["dow"].between(0, 6).all()
    assert pdf["hour"].between(0, 23).all()
    # the epoch dow formula uses the Sunday=0 convention; pin it against
    # the calendar: 2024-01-01 was a Monday (-> 1), 1970-01-01 a Thursday
    # (-> 4)
    for day, want in ((datetime.date(1970, 1, 1), 4), (datetime.date(2024, 1, 1), 1)):
        epoch_day = (day - datetime.date(1970, 1, 1)).days
        assert (epoch_day + 4) % 7 == want == (day.weekday() + 1) % 7


def test_trips_consistent_with_stays(spark):
    trips = q.events_trips(spark, SF).toPandas()
    stays = q.events_stay_points(spark, SF).toPandas()
    assert len(trips) > 0
    # each user's trips = stays - 1 (a trip per consecutive stay pair)
    t = trips.groupby("user_id").size()
    s = stays.groupby("user_id").size()
    for uid, n in s.items():
        assert t.get(uid, 0) == n - 1
    # time flows forward: next stay's arrival is never before this
    # stay's departure (islands are contiguous time runs)
    assert (trips["travel_sec"] >= 0).all()
