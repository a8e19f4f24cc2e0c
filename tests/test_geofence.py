"""Geofence wave: scalar references for containment/dwell, the enter/exit
state machine, and the broadcast-equi-join plan contract."""

from __future__ import annotations

import duckdb
import pandas as pd

from tree_sitter_codeviews_spark import layers, queries as q

SF = "/root/testdata/sf0.001"


def _pings():
    return duckdb.sql(f"""
        SELECT user_id, ts, event_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS sec,
               {layers.EVT_GX_SQL} AS ex, {layers.EVT_GY_SQL} AS ey
        FROM read_parquet('{SF}/events.parquet')
    """).df()


def _fences():
    return [
        (i, (i * 37 + 11) % layers.GRID_N, (i * 73 + 29) % layers.GRID_N)
        for i in range(0, layers.N_GAZ, q.FENCE_MOD)
    ]


def test_geofence_dwell_vs_scalar_reference(spark):
    """Engine dwell rollup == brute-force all-pairs containment at sf0.001."""
    got = (
        q.events_geofence_dwell(spark, SF)
        .toPandas()
        .set_index(["user_id", "fence_id"])
        .sort_index()
    )
    agg: dict = {}
    for row in _pings().itertuples():
        for fid, fx, fy in _fences():
            if abs(row.ex - fx) <= q.FENCE_R and abs(row.ey - fy) <= q.FENCE_R:
                cur = agg.get((row.user_id, fid))
                if cur is None:
                    agg[(row.user_id, fid)] = [1, row.sec, row.sec, row.event_id]
                else:
                    cur[0] += 1
                    cur[1] = min(cur[1], row.sec)
                    cur[2] = max(cur[2], row.sec)
                    cur[3] = min(cur[3], row.event_id)
    want = pd.DataFrame(
        [
            (u, f, n, hi - lo, first)
            for (u, f), (n, lo, hi, first) in agg.items()
        ],
        columns=["user_id", "fence_id", "n_pings", "dwell_sec", "first_event_id"],
    ).set_index(["user_id", "fence_id"]).sort_index()
    assert len(got) == len(want) > 0
    assert (got.to_numpy() == want.to_numpy()).all()


def test_geofence_transitions_state_machine(spark):
    """Every user's transition stream is a legal state machine: starts with
    an enter, alternates consistently (from_fence of each row == to_fence of
    the previous row), exits go to -1, switches change fence."""
    got = q.events_geofence_transitions(spark, SF).toPandas()
    assert len(got) > 0
    assert set(got["kind"]) <= {"enter", "exit", "switch"}
    # resolve per-ping state independently to order transitions by time
    pings = _pings()
    fences = _fences()

    def state(ex, ey):
        best = -1
        for fid, fx, fy in fences:
            if abs(ex - fx) <= q.FENCE_R and abs(ey - fy) <= q.FENCE_R:
                best = fid if best == -1 else min(best, fid)
        return best

    pings["fence"] = [state(r.ex, r.ey) for r in pings.itertuples()]
    pings = pings.sort_values(["user_id", "ts", "event_id"])
    # scalar replay of the lag state machine
    want_rows = []
    for uid, grp in pings.groupby("user_id", sort=False):
        prev = None
        for r in grp.itertuples():
            f = r.fence
            if (prev is None and f != -1) or (prev is not None and prev != f):
                kind = (
                    "exit" if f == -1
                    else "enter" if prev is None or prev == -1
                    else "switch"
                )
                want_rows.append((uid, r.event_id, prev if prev is not None else -1, f, kind))
            prev = f
    want = pd.DataFrame(
        want_rows, columns=["user_id", "event_id", "from_fence", "to_fence", "kind"]
    ).sort_values(["user_id", "event_id"]).reset_index(drop=True)
    gots = (
        got[["user_id", "event_id", "from_fence", "to_fence", "kind"]]
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(gots, want, check_dtype=False)
    # first transition of each user is never an exit-from-nothing
    firsts = gots.groupby("user_id").first()
    assert (firsts["kind"] == "enter").all()


def test_geofence_plans_broadcast_never_nested_loop(spark):
    """The fence dim must broadcast as an EQUI-join on cover cells — a
    BroadcastNestedLoopJoin would evaluate all 100 fence predicates per
    ping and is the scale failure mode this operator exists to avoid."""
    for fn in (q.events_geofence_dwell, q.events_geofence_transitions):
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, fn.__name__
        assert "BroadcastNestedLoopJoin" not in plan, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__


def test_fence_cover_bounded(spark):
    """Each fence explodes to at most 4 cover cells (the 2x2 bound the
    broadcast-size contract assumes)."""
    from pyspark.sql import functions as F

    cover = q._fence_cover(spark)
    per = cover.groupBy("fence_id").agg(F.count(F.lit(1)).alias("n")).toPandas()
    assert len(per) == layers.N_GAZ // q.FENCE_MOD
    assert per["n"].max() <= 4


def test_stream_geofence_equals_batch(spark):
    """The stateful streaming detector drained over bounded input emits
    exactly the batch transition set (same rows, same kinds)."""
    got = (
        q.events_stream_geofence(spark, SF)
        .toPandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    want = (
        q.events_geofence_transitions(spark, SF)
        .toPandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )


def test_state_history_scd2_invariants(spark):
    """SCD-2 contract: per user, versions are contiguous from 1, intervals
    chain exactly (valid_to == next valid_from), exactly one open row
    (valid_to NULL), consecutive states differ, and the history replays
    the transition stream."""
    hist = (
        q.events_state_history(spark, SF)
        .toPandas()
        .sort_values(["user_id", "version"])
    )
    trans = q.events_geofence_transitions(spark, SF).toPandas()
    assert len(hist) > 0
    for uid, grp in hist.groupby("user_id"):
        assert list(grp["version"]) == list(range(1, len(grp) + 1))
        assert grp["valid_to"].isna().sum() == 1
        assert pd.isna(grp["valid_to"].iloc[-1])
        chained = grp["valid_to"].iloc[:-1].to_numpy()
        nxt = grp["valid_from"].iloc[1:].to_numpy()
        assert (chained == nxt).all()
        states = grp["state"].to_numpy()
        assert (states[1:] != states[:-1]).all()
    # a user's transition count equals runs-1 plus an initial enter when
    # the first state is inside a fence (prev NULL & state != -1)
    for uid, grp in hist.groupby("user_id"):
        n_trans = len(trans[trans["user_id"] == uid])
        expected = len(grp) - 1 + (1 if grp["state"].iloc[0] != -1 else 0)
        assert n_trans == expected


def test_day_bitmask_pairs_antisymmetric_and_bounded(spark):
    pdf = q.geo_tile_day_bitmask(spark, SF).toPandas()
    assert len(pdf) > 0
    assert (pdf["n_both"] >= 1).all()
    assert (pdf["n_both"] <= pdf["n_either"]).all()
    assert (pdf["jaccard_ppm"] <= 1_000_000).all()
    # strict ordering => no pair appears twice
    key = pdf["ta_x"] * 2**30 + pdf["ta_y"] * 2**20 + pdf["tb_x"] * 2**10 + pdf["tb_y"]
    assert key.is_unique


def test_fence_affinity_lift_semantics(spark):
    """Lift > 1e6 iff the pair beats independence; every pair is grounded
    in the per-fence visitor counts; symmetric pairs never appear."""
    pdf = q.geo_fence_affinity(spark, "/root/testdata/sf0.01").toPandas()
    assert len(pdf) > 0
    assert (pdf["fa"] < pdf["fb"]).all()
    assert (pdf["n_both"] <= pdf[["n_a", "n_b"]].min(axis=1)).all()
    # recompute one pair's lift by hand
    r = pdf.iloc[0]
    n_users = q.events_geofence_dwell(spark, "/root/testdata/sf0.01") \
        .select("user_id").distinct().count()
    assert r["lift_ppm"] == r["n_both"] * n_users * 1_000_000 // (r["n_a"] * r["n_b"])


def test_changepoint_is_argmax_of_cusum(spark):
    """The reported day maximizes |n*S_k - k*S_n| — replayed scalar-side
    for a few tiles."""
    import duckdb

    pdf = q.geo_tile_changepoint(spark, SF).toPandas()
    daily = duckdb.sql(f"""
        SELECT ((event_id * 48271 + 7) % 1024) >> 7 AS tx,
               ((event_id * 16807 + 12345) % 1024) >> 7 AS ty,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day, count(*) AS cnt
        FROM read_parquet('{SF}/events.parquet') GROUP BY 1, 2, 3
    """).df()
    for _, row in pdf.head(5).iterrows():
        g = daily[(daily["tx"] == row["tx"]) & (daily["ty"] == row["ty"])].sort_values("day")
        n, sn = len(g), g["cnt"].sum()
        best, best_day = -1, None
        sk = 0
        for k, (_, rr) in enumerate(g.iterrows(), start=1):
            sk += rr["cnt"]
            dk = abs(n * sk - k * sn)
            if dk > best:
                best, best_day = dk, rr["day"]
        assert row["cusum_peak"] == best and row["change_day"] == best_day


def test_purchase_attribution_partitions_purchases(spark):
    """Every purchase lands in exactly one row's count (fence or -1), and
    revenue-per-fence is bounded by the occupancy footprint."""
    import duckdb
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"
    att = q.events_purchase_attribution(spark, sf).toPandas()
    total = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf}/events.parquet') "
        "WHERE event_type = 'purchase'"
    ).fetchone()[0]
    assert att["n_purchases"].sum() == total
    assert (att["n_buyers"] <= att["n_purchases"]).all()
    # fences with purchases are a subset of fences with occupancy
    occ = set(
        q.events_geofence_occupancy(spark, sf)
        .select("fence_id").distinct().toPandas()["fence_id"]
    )
    assert set(att[att["fence_id"] >= 0]["fence_id"]) <= occ
