"""Bit-equality of the guard-banded ``_ivf_route`` prefilter against the
full B x C emission (the pre-r6 kernel, inlined as the reference).

The prefilter drops (vector, centroid) rows that provably cannot survive
the Spark-side round(cos,6) max_by / top-nprobe window. The fixture
plants the cases the proof leans on: exact cosine ties (identical and
scaled-identical vectors among the centroids — ALL tied rows must reach
the Spark side so the cent_id tie-break sees them) and near-threshold
values within the 2e-6 guard band.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tree_sitter_codeviews_spark.operators import ann
from tree_sitter_codeviews_spark.operators.ann import _ivf_route, _with_norm
from tree_sitter_codeviews_spark.operators.dedup import quantize_col


def _reference_route(qn, every, centroid_every, nprobe):
    """Full-emission route (pre-prefilter implementation, verbatim)."""
    from pyspark.sql import Window

    crows = (
        qn.filter(F.col("vec_id") % centroid_every == 0)
        .select("vec_id", "qv").collect()
    )
    cent_ids = np.array([r["vec_id"] for r in crows], dtype=np.int64)
    cmat = np.array([r["qv"] for r in crows], dtype=np.int64)
    cnorms = (cmat * cmat).sum(axis=1)
    score_schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("cent_id", T.LongType()),
        T.StructField("dotc", T.LongType()),
        T.StructField("norm", T.LongType()),
        T.StructField("cnorm", T.LongType()),
    ])

    def _score(batches):
        n_c = len(cent_ids)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            m = np.stack(pdf["qv"].to_numpy()).astype(np.int64)
            dots = m @ cmat.T
            yield pd.DataFrame({
                "vec_id": np.repeat(ids, n_c),
                "cent_id": np.tile(cent_ids, len(ids)),
                "dotc": dots.ravel(),
                "norm": np.repeat(pdf["norm"].to_numpy(dtype=np.int64), n_c),
                "cnorm": np.tile(cnorms, len(ids)),
            })

    scored = (
        qn.select("vec_id", "qv", "norm").mapInPandas(_score, score_schema)
        .withColumn(
            "cosc",
            F.round(F.col("dotc").cast("double")
                    / F.sqrt(F.col("norm").cast("double")
                             * F.col("cnorm").cast("double")), 6),
        )
        .select("vec_id", "cent_id", "cosc")
    )
    assign = scored.groupBy("vec_id").agg(
        F.max_by("cent_id", F.struct(
            F.col("cosc"), (-F.col("cent_id")).alias("_n"))).alias("cent_id")
    )
    wq = Window.partitionBy("vec_id").orderBy(
        F.col("cosc").desc(), F.col("cent_id").asc())
    qprobe = (
        scored.filter(F.col("vec_id") % every == 0)
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select(F.col("vec_id").alias("query_id"), "cent_id")
    )
    return assign, qprobe


def _fixture(spark):
    rng = np.random.default_rng(7)
    rows = []
    base = rng.normal(size=(8, 64))
    for i in range(64):
        v = base[i % 8] + rng.normal(scale=0.05, size=64)
        rows.append((i, [float(x) for x in v]))
    # exact-tie plants: vec 61 identical to centroid 40; vec 62 = 2x
    # centroid 44 (cos exactly 1 with it); centroids 40/44/48 all equal
    # (three-way rounded tie -> cent_id tie-break matters)
    ident = [float(x) for x in base[3]]
    rows[40] = (40, ident)
    rows[44] = (44, ident)
    rows[48] = (48, ident)
    rows[61] = (61, ident)
    rows[62] = (62, [2.0 * x for x in ident])
    # (a zero-norm vector would be NaN cosine, but ANSI mode turns the
    # Spark-side division into a hard DIVIDE_BY_ZERO in the old and new
    # kernels alike — the NaN keep-always branch is defensive only)
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_route_prefilter_matches_full_emission(spark):
    embs = _fixture(spark)
    q = embs.select("vec_id", quantize_col(F.col("embedding")).alias("qv"))
    qn = _with_norm(q)
    every, centroid_every, nprobe = 5, 4, 3
    a_new, p_new = _ivf_route(qn, every, centroid_every, nprobe)
    a_ref, p_ref = _reference_route(qn, every, centroid_every, nprobe)
    assert sorted(map(tuple, a_new.collect())) == \
        sorted(map(tuple, a_ref.collect()))
    assert sorted(map(tuple, p_new.collect())) == \
        sorted(map(tuple, p_ref.collect()))
    # non-vacuous: the tied vector routed to the SMALLEST tied centroid id
    amap = dict(a_new.collect())
    assert amap[61] == 40
