"""Production streaming job: parquet sink + checkpoint, exactly-once on
resume, output equals the batch transition set."""

from __future__ import annotations

import pandas as pd

from tree_sitter_codeviews_spark import queries as q

SF = "/root/testdata/sf0.001"


def test_geofence_stream_job_sink_and_resume(spark, tmp_path):
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    import run_geofence_stream as job

    out = str(tmp_path / "alerts")
    ckpt = str(tmp_path / "ckpt")

    written = job.run(spark, SF, out, ckpt)
    assert written > 0

    got = (
        spark.read.parquet(out)
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

    # RESUME: same checkpoint, unchanged input -> zero new rows (the
    # source log remembers committed files; append sink stays exactly-once)
    written2 = job.run(spark, SF, out, ckpt)
    assert written2 == 0
