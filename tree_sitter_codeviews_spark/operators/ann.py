"""Similarity search over embedding columns — five families:

- ``topk_quantized``: exact top-k by integer-quantized dot product — fully
  native (zip_with/aggregate, JVM codegen), bit-reproducible vs the SQL
  oracle. The correctness baseline.
- ``topk_cosine_pandas``: float cosine top-k with an Arrow-batched pandas UDF
  doing one numpy matmul per batch against a broadcast query matrix — the
  measured fast path at scale (BLAS beats codegen'd per-element loops on
  64-dim vectors).
- ``lsh_bucketed_topk``: random-hyperplane LSH pre-bucketing so each query
  only scores its bucket's candidates — the 10^12-row path; recall<1 by
  contract, rescued by multi-probe (neighbor buckets at hamming 1).
- ``ivf_topk``: inverted-file ANN — sampled-centroid coarse quantizer, GEMM
  build, nprobe cell probing; oracle-mirrored exactly.
- ``pq_topk``: product quantization + asymmetric-distance (ADC) scoring —
  the memory-bound family (one packed long per corpus vector in the join);
  oracle-mirrored exactly.
- ``ivfpq_topk``: IVF routing × PQ/ADC scoring — the faiss-IVFPQ production
  composition (sub-linear in vectors touched AND bytes per touch);
  oracle-mirrored exactly.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dedup import quantize_col


def _query_set(embs: DataFrame, every: int = 50) -> DataFrame:
    return embs.filter(F.col("vec_id") % every == 0)


def topk_quantized(embs: DataFrame, k: int = 10, every: int = 50) -> DataFrame:
    """(query_id, neighbor_id, rank, dot_q): exact top-k by integer dot.

    The query side is tiny (1/every of the corpus — collected once under
    the same 200k cap as ``topk_cosine_pandas`` and captured in the UDF
    closure); the corpus streams map-side through ONE int64 numpy GEMM per
    Arrow batch, with an exact per-batch local top-k by the FINAL total
    order (dot desc, neighbor_id asc — lexsort, so int64 ties break
    identically). Local top-k by the final order is a proven superset of
    the global top-k (if k batch rows beat a row locally they beat it
    globally), so the closing window over ~k·|queries| rows per batch is
    bit-identical to the former crossJoin + interpreted 64-element HOF
    fold, which evaluated per pair (measured: the fold dominated the
    stage)."""
    q = embs.select("vec_id", quantize_col(F.col("embedding")).alias("qv"))
    max_queries = 200_000
    qrows = _query_set(q, every).limit(max_queries + 1).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"topk_quantized: query set exceeds {max_queries} rows; "
            "use the bucketed ANN family for dense query sides"
        )
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qmat = np.array([r["qv"] for r in qrows], dtype=np.int64)

    out_schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("dot_q", T.LongType()),
    ])

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            m = np.stack(pdf["qv"].to_numpy()).astype(np.int64)
            dots = qmat @ m.T  # (Q, B) exact int64
            out_q, out_n, out_d = [], [], []
            for qi in range(len(qids)):
                keep = ids != qids[qi]
                cids, cdots = ids[keep], dots[qi][keep]
                order = np.lexsort((cids, -cdots))[:k]
                out_q.append(np.full(len(order), qids[qi], dtype=np.int64))
                out_n.append(cids[order])
                out_d.append(cdots[order])
            yield pd.DataFrame({
                "query_id": np.concatenate(out_q),
                "neighbor_id": np.concatenate(out_n),
                "dot_q": np.concatenate(out_d),
            })

    w = Window.partitionBy("query_id").orderBy(F.col("dot_q").desc(), F.col("neighbor_id").asc())
    return (
        q.select("vec_id", "qv").mapInPandas(score, out_schema)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dot_q")
    )


def exact_cosine_gt_candidates(
    embs: DataFrame, k: int = 10, every: int = 50,
) -> DataFrame:
    """(query_id, neighbor_id, dot, norm_a, norm_b): a PROVEN superset of
    each query's top-k by the final order ``round(cos, 6) desc,
    neighbor_id asc`` — the ground-truth leg of the recall eval, computed
    as one int64 numpy GEMM per Arrow batch instead of a crossJoin with an
    interpreted per-pair HOF fold. dot/norms are exact int64 (identical to
    the SQL aggregates); the caller re-derives cos_q with the SAME Spark
    SQL round/divide and runs the exact global window, so the final rows
    are bit-identical.

    Safety of the local cut: per batch and query, with c_k = the k-th
    largest unrounded cos, rows with cos < c_k − 2e-6 are dropped. For any
    such row, round(cos,6) < round(c_k − …) by at least one 1e-6 step
    below every kept-row's rounded value (round moves a value by ≤ 5e-7),
    so ≥ k same-batch rows strictly beat it on rounded cos alone — it
    cannot be in the batch's, hence the global, top-k. NaN cos (zero-norm
    vectors; Spark sorts NaN above every double in a descending order) is
    treated as +inf for selection, so such rows are always kept."""
    q = embs.select("vec_id", quantize_col(F.col("embedding")).alias("qv"))
    max_queries = 200_000
    qrows = _query_set(q, every).limit(max_queries + 1).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"exact_cosine_gt_candidates: query set exceeds {max_queries} "
            "rows; the GT leg is an offline eval on a bounded query sample"
        )
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qmat = np.array([r["qv"] for r in qrows], dtype=np.int64)
    qnorm = (qmat * qmat).sum(axis=1)

    out_schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("dot", T.LongType()),
        T.StructField("norm_a", T.LongType()),
        T.StructField("norm_b", T.LongType()),
    ])

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            m = np.stack(pdf["qv"].to_numpy()).astype(np.int64)
            bnorm = (m * m).sum(axis=1)
            dots = qmat @ m.T  # (Q, B) exact int64
            with np.errstate(invalid="ignore", divide="ignore"):
                cos = dots / np.sqrt(
                    qnorm.astype(np.float64)[:, None]
                    * bnorm.astype(np.float64)[None, :]
                )
            cos = np.where(np.isnan(cos), np.inf, cos)
            out: list[dict] = []
            for qi in range(len(qids)):
                keep = ids != qids[qi]
                c = cos[qi][keep]
                if len(c) > k:
                    c_k = np.partition(c, -k)[-k]
                    sel = c >= c_k - 2e-6
                else:
                    sel = np.ones(len(c), dtype=bool)
                out.append({
                    "query_id": np.full(int(sel.sum()), qids[qi], dtype=np.int64),
                    "neighbor_id": ids[keep][sel],
                    "dot": dots[qi][keep][sel],
                    "norm_a": np.full(int(sel.sum()), qnorm[qi], dtype=np.int64),
                    "norm_b": bnorm[keep][sel],
                })
            yield pd.DataFrame({
                col: np.concatenate([o[col] for o in out])
                for col in ("query_id", "neighbor_id", "dot", "norm_a", "norm_b")
            })

    return q.select("vec_id", "qv").mapInPandas(score, out_schema)


def topk_cosine_pandas(embs: DataFrame, k: int = 10, every: int = 50) -> DataFrame:
    """Float cosine top-k; one numpy GEMM per Arrow batch (the fast path).

    Queries are collected once (tiny), L2-normalized, and captured in the
    UDF closure (broadcast-equivalent). Per batch: normalize rows, matmul,
    argpartition local top-k; the global top-k is a final window.

    Driver-safety guard (round-1 finding): the collect is bounded only by
    the ``every`` sampling contract, so an explicit cap fails fast if a
    caller reuses this with a dense query set — switch to lsh_bucketed_topk
    (bucketed join, no driver materialization) for large query sides."""
    max_queries = 200_000  # ~100 MB of float64[64] on the driver
    qrows = (
        _query_set(embs, every)
        .select("vec_id", "embedding")
        .limit(max_queries + 1)
        .collect()
    )
    if len(qrows) > max_queries:
        raise ValueError(
            f"topk_cosine_pandas: query set exceeds {max_queries} rows; "
            "use lsh_bucketed_topk for dense query sides"
        )
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qmat = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)

    out_schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("cos", T.DoubleType()),
    ])

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            m = np.stack(pdf["embedding"].to_numpy())
            m = m.astype(np.float64)
            m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            sims = qmat @ m.T  # (Q, B)
            kk = min(k + 1, sims.shape[1])
            part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = {
                "query_id": np.repeat(qids, kk),
                "neighbor_id": ids[part.ravel()],
                "cos": np.take_along_axis(sims, part, axis=1).ravel(),
            }
            yield pd.DataFrame(rows)

    scored = embs.select("vec_id", "embedding").mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round(F.col("cos"), 6).alias("cos"))
    )


def _with_norm(q: DataFrame) -> DataFrame:
    return q.withColumn(
        "norm",
        F.aggregate(F.transform("qv", lambda x: x * x), F.lit(0).cast("long"),
                    lambda acc, v: acc + v),
    )


def _ivf_route(
    qn: DataFrame, every: int, centroid_every: int, nprobe: int
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse routing shared by ``ivf_topk`` / ``ivfpq_topk``: returns
    ``(assign, qprobe)`` — the nearest-centroid cell of every corpus vector
    (``vec_id, cent_id``) and the ``nprobe`` probed cells of every query
    (``query_id, cent_id``)."""
    # centroid scoring: collect the (bounded) centroid table once and run
    # one int64 numpy GEMM per Arrow batch — the faiss-style IVF build.
    # Dots stay exact integers; cos + round happen Spark-side so the
    # rounding mode matches every other oracle-checked query. (The first
    # cut cross-joined a broadcast centroid DF and folded the dot with an
    # interpreted zip_with/aggregate lambda — correct, but ~100k
    # interpreted 64-dim folds at sf0.1; the GEMM is the production shape.)
    max_cents = 100_000  # |C| ~ sqrt(N) on a real corpus; hard driver guard
    crows = (
        qn.filter(F.col("vec_id") % centroid_every == 0)
        .select("vec_id", "qv").limit(max_cents + 1).collect()
    )
    if len(crows) > max_cents:
        raise ValueError(
            f"ivf_topk: centroid set exceeds {max_cents}; swap the sampled "
            "centroids for trained fixed-size ones at this scale"
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
            dots = m @ cmat.T  # (B, C), exact int64
            norms = pdf["norm"].to_numpy(dtype=np.int64)
            # emit only a PROVEN superset of each vector's winners instead
            # of all B x C pairs (the Spark-side round/max_by/window below
            # is unchanged and does the exact selection): with c_t = the
            # t-th largest unrounded cos (t = nprobe for query vectors,
            # 1 otherwise), rows with cos < c_t - 2e-6 satisfy
            # round(cos) < round(c_t) (round moves a value <= 5e-7), so
            # >= t rows strictly beat them on the ROUNDED key and they
            # cannot be selected even via ties; rounded ties of the t-th
            # value itself all survive the cut. NaN cos (zero-norm
            # vectors) sorts highest in Spark — treated as +inf, always
            # kept. Same guard-band discipline as
            # ``exact_cosine_gt_candidates``.
            with np.errstate(invalid="ignore", divide="ignore"):
                cos = dots / np.sqrt(
                    norms.astype(np.float64)[:, None]
                    * cnorms.astype(np.float64)[None, :]
                )
            cos = np.where(np.isnan(cos), np.inf, cos)
            t = np.where(ids % every == 0, min(nprobe, n_c), 1)
            cuts = sorted({n_c - int(v) for v in np.unique(t)})
            part = np.partition(cos, cuts, axis=1)
            kth = np.take_along_axis(part, (n_c - t)[:, None], axis=1)[:, 0]
            row, col = np.nonzero(cos >= (kth - 2e-6)[:, None])
            yield pd.DataFrame({
                "vec_id": ids[row],
                "cent_id": cent_ids[col],
                "dotc": dots[row, col],
                "norm": norms[row],
                "cnorm": cnorms[col],
            })

    scored = (
        qn.select("vec_id", "qv", "norm").mapInPandas(_score, score_schema)
        .withColumn(
            "cosc",
            F.round(F.col("dotc").cast("double")
                    / F.sqrt(F.col("norm").cast("double") * F.col("cnorm").cast("double")), 6),
        )
        .select("vec_id", "cent_id", "cosc")
    )
    # nearest centroid per vector; ties broken to the smallest cent_id
    assign = scored.groupBy("vec_id").agg(
        F.max_by("cent_id", F.struct(F.col("cosc"), (-F.col("cent_id")).alias("_n"))).alias("cent_id")
    )
    wq = Window.partitionBy("vec_id").orderBy(F.col("cosc").desc(), F.col("cent_id").asc())
    qprobe = (
        scored.filter(F.col("vec_id") % every == 0)
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select(F.col("vec_id").alias("query_id"), "cent_id")
    )
    return assign, qprobe


def ivf_topk(
    embs: DataFrame,
    k: int = 10,
    every: int = 50,
    centroid_every: int = 40,
    nprobe: int = 4,
) -> DataFrame:
    """IVF (inverted-file) ANN: coarse-quantize the corpus into cells, score
    each query only against its ``nprobe`` nearest cells' vectors.

    Centroids are a deterministic 1/``centroid_every`` sample of the corpus
    itself (no iterative k-means — a fixed, oracle-reproducible coarse
    quantizer). Build: one broadcast of the centroid table, map-side scoring,
    ``max_by`` assignment (partial-aggregated, so the pre-shuffle width is one
    row per vector). Read: queries probe their nprobe nearest cells and
    equi-join the cell's inverted list — shuffle bounded by cell sizes, never
    all-pairs. Recall < 1 when a true neighbor's cell isn't probed (the IVF
    contract); the output itself is deterministic, so the gate oracle mirrors
    it exactly (quantized integer dots, round-6 cosine, id tie-breaks).

    At 10^12 rows: |C| = N/centroid_every overflows a broadcast — swap the
    sampled centroids for trained ones (fixed |C| ~ sqrt(N)) and the same
    plan holds; nothing else changes shape.
    """
    q = embs.select("vec_id", quantize_col(F.col("embedding")).alias("qv"))
    qn = _with_norm(q)
    assign, qprobe = _ivf_route(qn, every, centroid_every, nprobe)
    nbrs = assign.join(qn, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"), "cent_id",
        F.col("qv").alias("qb"), F.col("norm").alias("norm_b"),
    )
    qvecs = qn.select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qa"),
        F.col("norm").alias("norm_a"),
    )
    dot = F.aggregate(
        F.zip_with("qa", "qb", lambda x, y: x * y),
        F.lit(0).cast("long"), lambda acc, v: acc + v,
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_q").desc(), F.col("neighbor_id").asc())
    return (
        F.broadcast(qprobe.join(qvecs, "query_id")).join(nbrs, "cent_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("dot", dot)
        .withColumn(
            "cos_q",
            F.round(F.col("dot").cast("double")
                    / F.sqrt(F.col("norm_a").cast("double") * F.col("norm_b").cast("double")), 6),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_q")
    )


N_PLANES = 12  # 4096 buckets


def lsh_bucketed_topk(
    embs: DataFrame, k: int = 10, every: int = 50, dim: int = 64,
) -> DataFrame:
    """Hyperplane-LSH bucketed ANN — the 10^12-row path, and oracle-checkable.

    The planes are the DETERMINISTIC integer hyperplanes shared with
    ``dedup.embedding_lsh_dups`` (round-2 they were fixed-seed numpy
    normals, which no SQL oracle could mirror; round-3 finding closed).
    Buckets are exact int64 arithmetic, so DuckDB reproduces them
    bit-for-bit; the oracle mirrors the SAME candidate rule (bucket
    hamming <= 1), not exact kNN, so recall<1 does not break the gate.

    Scale shape: corpus bucketed once (one narrow pass), queries (1/every
    of the corpus) explode 13 probes (own bucket + hamming-1 neighbors),
    candidates by bucket equi-join — shuffle bounded by bucket sizes,
    never all-pairs. Ranking = exact quantized cosine (int dot / sqrt of
    int norms, round 6) over candidates only. A (query, neighbor) pair
    matches via exactly one probe (mask = xor of buckets), so no dedup
    pass is needed."""
    from .dedup import embedding_bucket_udf, int_dot_udf

    bucketize = embedding_bucket_udf(dim, N_PLANES)
    qn = (
        embs.select("vec_id", quantize_col(F.col("embedding")).alias("qv"))
        .withColumn(
            "norm",
            F.aggregate(F.transform("qv", lambda x: x * x),
                        F.lit(0).cast("long"), lambda a, v: a + v),
        )
        .withColumn("bucket", bucketize(F.col("qv")))
    )
    corpus = qn.select(
        F.col("vec_id").alias("neighbor_id"), F.col("qv").alias("qb"),
        F.col("norm").alias("nb"), "bucket",
    )
    queries = _query_set(qn, every).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qa"),
        F.col("norm").alias("na"), F.col("bucket").alias("qbucket"),
    )
    probes = F.array(
        F.col("qbucket"),
        *[F.col("qbucket").bitwiseXOR(F.lit(1 << i)) for i in range(N_PLANES)],
    )
    qprobed = queries.select(
        "query_id", "qa", "na", F.explode(probes).alias("bucket")
    )
    cos = F.round(
        F.col("dot").cast("double")
        / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double")),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_q").desc(), F.col("neighbor_id").asc()
    )
    return (
        qprobed.join(corpus, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("dot", int_dot_udf(F.col("qa"), F.col("qb")))
        .withColumn("cos_q", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_q")
    )


# --- product quantization (PQ / ADC) ----------------------------------------
#
# The third ANN family next to IVF and hyperplane LSH: compress each vector
# to M=8 6-bit codes (one per 8-dim subspace, K=64 centroids each) and score
# queries against the compressed corpus with an asymmetric-distance lookup
# table — faiss's PQ/ADC shape. The codebook is "trained" the deterministic
# way the IVF centroids are: per subspace, the subvectors of a fixed corpus
# sample (a synthetic LCG lattice measured 12% recall vs exact L2 — off the
# data manifold; the sampled codebook measures ~5x better on the fixture).
# Everything is exact int64 arithmetic, so the DuckDB oracle mirrors the
# sample, the encode, the LUT and the ranking bit-for-bit.

PQ_M, PQ_DSUB, PQ_K = 8, 8, 64  # M * DSUB == dim; 8x6-bit codes pack in a long
PQ_SAMPLE_MOD = 3               # codebook sample: vec_id % MOD == 1, first K


def _pq_codebook_from(sample: np.ndarray) -> np.ndarray:
    """(M, K, DSUB) centroids: subvectors of the K sampled corpus rows."""
    k = sample.shape[0]
    return sample.reshape(k, PQ_M, PQ_DSUB).transpose(1, 0, 2).copy()


def _pq_sample(q: DataFrame, col: str = "qv") -> np.ndarray:
    rows = (
        q.filter(F.col("vec_id") % PQ_SAMPLE_MOD == 1)
        .orderBy("vec_id").limit(PQ_K).select("vec_id", col).collect()
    )
    if len(rows) < 2:
        raise ValueError("pq_topk: corpus too small to sample a codebook")
    return np.array([r[col] for r in rows], dtype=np.int64)


def _pq_d2_batch(x: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """(B, 64) int64 vectors -> (B, M, K) exact squared subdistances.

    ||x - c||^2 expanded as ||x||^2 + ||c||^2 - 2 x.c with the cross term
    as one float64 BLAS GEMM per subspace: quantized coordinates are
    |v| <= ~2^13 (round(1000x) of unit-ish floats), so every product and
    every DSUB-term sum stays far below 2^53 — float64 is EXACT here, and
    the cast back to int64 is lossless. (The former broadcast-subtract
    formulation allocated B x K x DSUB temporaries — memory traffic, not
    arithmetic, dominated its cost.)"""
    b = x.shape[0]
    sub = x.reshape(b, PQ_M, PQ_DSUB).astype(np.float64)     # (B, M, D)
    c = cb.astype(np.float64)                                # (M, K, D)
    cross = np.einsum("bmd,mkd->bmk", sub, c)                # BLAS per m
    xn = (sub * sub).sum(-1)                                 # (B, M)
    cn = (c * c).sum(-1)                                     # (M, K)
    return (xn[:, :, None] + cn[None, :, :] - 2.0 * cross).astype(np.int64)


def _pq_pack(d2: np.ndarray) -> np.ndarray:
    """(B, M, K) subdistances -> (B,) packed 6-bit codes (argmin per
    subspace; numpy argmin takes the first occurrence on ties — the
    smallest code, matching the SQL oracle's arg_min tie rule)."""
    codes = d2.argmin(axis=2)                                # (B, M)
    packed = np.zeros(d2.shape[0], dtype=np.int64)
    for m in range(PQ_M):
        packed |= codes[:, m].astype(np.int64) << (6 * m)
    return packed


def pq_encode_udf(cb: np.ndarray):

    @F.pandas_udf(T.LongType())
    def encode(qv: pd.Series) -> pd.Series:
        if len(qv) == 0:
            return pd.Series([], dtype="int64")
        x = np.stack(qv.to_numpy()).astype(np.int64)  # (B, 64)
        return pd.Series(_pq_pack(_pq_d2_batch(x, cb)), dtype="int64")

    return encode


def pq_encode_res_udf(cb: np.ndarray):
    """Residual encode fused into the Arrow kernel: codes of (qv - cv).
    Replaces a zip_with(qv, cv, -) projection feeding ``pq_encode_udf`` —
    higher-order-function lambdas are interpreted expression-eval, and the
    subtraction is exact int64 either way."""

    @F.pandas_udf(T.LongType())
    def encode(qv: pd.Series, cv: pd.Series) -> pd.Series:
        if len(qv) == 0:
            return pd.Series([], dtype="int64")
        x = (np.stack(qv.to_numpy()).astype(np.int64)
             - np.stack(cv.to_numpy()).astype(np.int64))
        return pd.Series(_pq_pack(_pq_d2_batch(x, cb)), dtype="int64")

    return encode


def pq_lut_udf(cb: np.ndarray):

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def lut(qv: pd.Series) -> pd.Series:
        if len(qv) == 0:
            return pd.Series([], dtype="object")
        x = np.stack(qv.to_numpy()).astype(np.int64)
        d2 = _pq_d2_batch(x, cb).reshape(len(x), PQ_M * cb.shape[1])
        return pd.Series(list(d2))

    return lut


def pq_lut_res_udf(cb: np.ndarray):
    """Per-cell residual LUT fused into the Arrow kernel: LUT of
    (qv - cv) — see ``pq_encode_res_udf``."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def lut(qv: pd.Series, cv: pd.Series) -> pd.Series:
        if len(qv) == 0:
            return pd.Series([], dtype="object")
        x = (np.stack(qv.to_numpy()).astype(np.int64)
             - np.stack(cv.to_numpy()).astype(np.int64))
        d2 = _pq_d2_batch(x, cb).reshape(len(x), PQ_M * cb.shape[1])
        return pd.Series(list(d2))

    return lut


def _adc_expr(n_codes: int):
    """ADC distance as a pure JVM expression over (``pqcode``, ``lut``):
    unpack the m-th 6-bit code from the packed long, look the subdistance up
    in the query's flattened LUT, sum the M terms."""
    adist = None
    for m in range(PQ_M):
        code_m = F.shiftright(F.col("pqcode"), 6 * m).bitwiseAND(F.lit(63))
        term = F.element_at(
            F.col("lut"), (code_m + F.lit(m * n_codes) + F.lit(1)).cast("int")
        )
        adist = term if adist is None else adist + term
    return adist


def pq_topk(embs: DataFrame, k: int = 10, every: int = 50) -> DataFrame:
    """(query_id, neighbor_id, rank, adist): ADC top-k over the PQ-compressed
    corpus. The corpus carries ONE long per vector (8 packed 6-bit codes);
    scoring is a pure JVM expression — 8 array lookups + adds per pair, no
    Python and no arrays on the corpus side of the join. At 10^12 rows this
    is the memory-bound shape PQ exists for: 8 bytes/vector instead of 512."""
    q = embs.select("vec_id", quantize_col(F.col("embedding")).alias("qv"))
    cb = _pq_codebook_from(_pq_sample(q))
    n_codes = cb.shape[1]
    corpus = q.select(
        F.col("vec_id").alias("neighbor_id"),
        pq_encode_udf(cb)(F.col("qv")).alias("pqcode"),
    )
    queries = _query_set(q, every).select(
        F.col("vec_id").alias("query_id"),
        pq_lut_udf(cb)(F.col("qv")).alias("lut"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adist").asc(), F.col("neighbor_id").asc())
    return (
        corpus.crossJoin(F.broadcast(queries))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("adist", _adc_expr(n_codes))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adist")
    )


def ivfpq_topk(
    embs: DataFrame,
    k: int = 10,
    every: int = 50,
    centroid_every: int = 40,
    nprobe: int = 4,
) -> DataFrame:
    """IVF routing + PQ/ADC scoring — the faiss-``IVFPQ`` composition, the
    shape production vector stores actually deploy: the coarse quantizer
    bounds WHICH vectors each query touches (nprobe inverted lists instead
    of the whole corpus), PQ bounds WHAT each touch costs (one packed long
    per corpus vector — 8 bytes instead of 512 — and 8 LUT adds per pair).

    ``pq_topk`` alone still scans every code per query (compute-bound);
    ``ivf_topk`` alone carries full vectors into the probed cells
    (memory-bound). This composition is sub-linear in BOTH: at 10^12 rows a
    query touches ~nprobe/|C| of the corpus at 8 bytes per touched vector.
    Codes are encoded on the RAW vectors (no residual subtraction), so the
    ADC distances are bit-identical to ``pq_topk``'s on the shared pairs and
    the DuckDB oracle mirrors routing and scoring exactly; classic IVFPQ
    residual encoding would improve recall but put float k-means between the
    engine and the oracle. Recall < 1 only via the routing contract (as
    ``ivf_topk``) and code quantization (as ``pq_topk``) — both measured by
    the companion recall eval; the output itself is fully deterministic.
    """
    q = embs.select("vec_id", quantize_col(F.col("embedding")).alias("qv"))
    assign, qprobe = _ivf_route(_with_norm(q), every, centroid_every, nprobe)
    cb = _pq_codebook_from(_pq_sample(q))
    corpus = q.select(
        F.col("vec_id").alias("neighbor_id"),
        pq_encode_udf(cb)(F.col("qv")).alias("pqcode"),
    ).join(assign.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
    queries = _query_set(q, every).select(
        F.col("vec_id").alias("query_id"),
        pq_lut_udf(cb)(F.col("qv")).alias("lut"),
    )
    # qprobe×queries is (|Q| * nprobe) rows — broadcast; the corpus side
    # streams through the equi-join on cent_id, so each corpus code is read
    # once and only probed cells produce pairs (never all-pairs).
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id").asc()
    )
    return (
        F.broadcast(qprobe.join(queries, "query_id")).join(corpus, "cent_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("adist", _adc_expr(cb.shape[1]))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adist")
    )


def ivfpq_residual_topk(
    embs: DataFrame,
    k: int = 10,
    every: int = 50,
    centroid_every: int = 40,
    nprobe: int = 4,
) -> DataFrame:
    """Residual-encoded IVFPQ — faiss's actual IVFPQ: PQ codes quantize
    ``vector - assigned_centroid`` instead of the raw vector, and each
    query builds one ADC lookup table PER PROBED CELL from its own residual
    against that cell's centroid. Residuals concentrate around the origin,
    so the same codebook budget quantizes them with less error than raw
    vectors — measured at gate scale this lifts recall@10 from
    ``ivfpq_topk``'s code-quantization ceiling (see FIXTURES.md).

    Everything stays EXACT int64 — residuals of integer-quantized vectors
    against integer sampled centroids are integers, so unlike float-k-means
    residual training the DuckDB oracle mirrors routing, residual encode,
    per-cell LUTs and ranking bit-for-bit. Scale shape is ``ivfpq_topk``'s
    plus one broadcast of the (bounded) centroid-vector table on each side:
    corpus codes are still one packed long per vector, queries still carry
    nprobe LUT rows, pairs still form only inside probed cells.
    """
    q = embs.select("vec_id", quantize_col(F.col("embedding")).alias("qv"))
    qn = _with_norm(q)
    assign, qprobe = _ivf_route(qn, every, centroid_every, nprobe)
    cents = qn.filter(F.col("vec_id") % centroid_every == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("qv").alias("cv")
    )
    assigned = q.join(assign, "vec_id").join(F.broadcast(cents), "cent_id")
    # the codebook sample leg still evaluates the residual as a projection
    # (only the ~PQ_K sampled rows reach it); the corpus/query encodes
    # subtract INSIDE the Arrow kernels instead (pq_encode_res_udf /
    # pq_lut_res_udf) — the zip_with lambda is interpreted expression-eval
    # and was evaluated once per corpus row
    res = assigned.withColumn(
        "rv", F.zip_with("qv", "cv", lambda a, b: a - b)
    ).select("vec_id", "cent_id", "rv")
    cb = _pq_codebook_from(_pq_sample(res, col="rv"))
    corpus = assigned.select(
        F.col("vec_id").alias("neighbor_id"), "cent_id",
        pq_encode_res_udf(cb)(F.col("qv"), F.col("cv")).alias("pqcode"),
    )
    qres = (
        qprobe.join(
            q.select(F.col("vec_id").alias("query_id"), F.col("qv").alias("qa")),
            "query_id",
        )
        .join(F.broadcast(cents), "cent_id")
        .select(
            "query_id", "cent_id",
            pq_lut_res_udf(cb)(F.col("qa"), F.col("cv")).alias("lut"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id").asc()
    )
    return (
        F.broadcast(qres).join(corpus, "cent_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("adist", _adc_expr(cb.shape[1]))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adist")
    )
