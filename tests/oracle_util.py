"""Mirror of the driver's correctness gate: run a Spark query and its DuckDB
oracle on the same parquet dir, compare row count, schema width, and
order-insensitive values (columns sorted by name, rows sorted)."""

from __future__ import annotations

import os

import duckdb
import pandas as pd


def duck_run(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.execute(sql).fetchdf()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if out[c].dtype.kind == "M":  # normalize datetime64 unit (ns vs us)
            out[c] = out[c].astype("datetime64[us]")
        elif out[c].dtype == object:
            out[c] = out[c].astype(str)
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def assert_matches(spark_df, sf_dir: str, oracle_sql: str, name: str = "?"):
    got = normalize(spark_df.toPandas())
    want = normalize(duck_run(sf_dir, oracle_sql))
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    # The external driver hashes FORMATTED values, so an int column on one
    # side vs a float column on the other (e.g. DuckDB sum(BIGINT) widening
    # to HUGEINT -> float64: "9707" vs "9707.0") is a driver-level mismatch
    # even when the values are numerically identical. check_dtype=False
    # masked exactly that (the r3 events_json_stats red row) — so fail hard
    # on any integer-vs-float kind drift before comparing values.
    for c in got.columns:
        gk, wk = got[c].dtype.kind, want[c].dtype.kind
        if {gk, wk} <= {"i", "u", "f"} and ("f" in (gk, wk)) != (gk == wk == "f"):
            raise AssertionError(
                f"{name}: column {c!r} int-vs-float representation drift "
                f"(spark dtype {got[c].dtype}, oracle dtype {want[c].dtype}) — "
                f"cast the oracle (or the query) so both sides agree"
            )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
