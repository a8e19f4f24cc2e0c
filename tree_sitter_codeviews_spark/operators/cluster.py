"""Distributed integer k-means and SemDeDup semantic dedup.

The trained coarse quantizer ``ann.ivf_topk``'s docstring promises at
10^12 rows ("swap the sampled centroids for trained ones"): Lloyd's
algorithm over quantized int64 embeddings, every step exact integer
arithmetic so the DuckDB oracle unrolls the same iterations bit-for-bit:

- distances are exact int64 (``|q|² - 2q·c + |c|²`` of ×1000-quantized
  vectors: |dist| ≤ 64·(2·10⁴)² ≈ 2.6e10, no overflow, and exactly
  representable as DOUBLE on the oracle side);
- argmin ties break to the LOWEST cluster id via the packed key
  ``dist*100 + cluster`` (k ≤ 100), min'd — identical in numpy
  (``argmin`` picks the first minimum) and SQL (``min`` of the pack);
- the centroid update is per-dimension TRUNCATED integer division
  (numpy ``sign·(|s|//n)`` == DuckDB ``//`` — both toward zero;
  Spark-side arithmetic never divides, the update runs on the ≤k
  collected aggregate rows);
- empty clusters keep their previous centroid (oracle: left join +
  coalesce against the prior layer).

Scale shape (the faiss-IVF build, distributed): per iteration ONE
map-side Arrow GEMM assignment (centroids broadcast as a k×d numpy
constant — k·d ≤ a few KB by definition of k-means) and ONE partial-
aggregated groupBy producing ≤k rows, which are collected (bounded by k,
never by corpus size). No all-pairs anything; the corpus is scanned
``iters+1`` times off a localCheckpoint.

SemDeDup (Abbas et al. 2023, arXiv:2303.09540): near-duplicate pairs
restricted to SAME-CLUSTER — the pair space is Σ|cluster|², bounded by
the quantizer's balance instead of corpus-quadratic. Pairs verify with
the same exact quantized-integer cosine as ``dedup.embedding_near_dups``.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dedup import quantize_col

__all__ = ["kmeans_fit", "kmeans_assign", "semantic_dups"]

_PACK = 100  # dist*_PACK + cluster argmin packing; requires k <= _PACK


def _trunc_div(s: np.ndarray, n: int) -> np.ndarray:
    """Integer division truncated toward zero — DuckDB ``//`` semantics
    (numpy ``//`` floors, which differs on negatives)."""
    s = np.asarray(s, dtype=np.int64)
    return np.sign(s) * (np.abs(s) // np.int64(n))


def _quantized(embs: DataFrame) -> DataFrame:
    return embs.select("vec_id", quantize_col(F.col("embedding")).alias("qv"))


def _assign(q: DataFrame, cmat: np.ndarray) -> DataFrame:
    """(vec_id, cluster, dist_q): nearest centroid per vector, one exact
    int64 GEMM per Arrow batch against the broadcast k×d centroid matrix."""
    cmat = np.asarray(cmat, dtype=np.int64)
    cnorm = (cmat * cmat).sum(axis=1)  # (k,)
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("cluster", T.LongType()),
        T.StructField("dist_q", T.LongType()),
    ])

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf["qv"].to_numpy()).astype(np.int64)
            d = (m * m).sum(axis=1)[:, None] - 2 * (m @ cmat.T) + cnorm[None, :]
            packed = d * np.int64(_PACK) + np.arange(len(cmat), dtype=np.int64)
            best = packed.min(axis=1)
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"].to_numpy(dtype=np.int64),
                "cluster": best % _PACK,
                "dist_q": best // _PACK,
            })

    return q.mapInPandas(_score, schema)


def _fit(q: DataFrame, k: int, iters: int) -> np.ndarray:
    """Lloyd training over a pre-quantized (and ideally checkpointed)
    frame — shared by fit/assign/semantic_dups so the corpus is quantized
    and materialized ONCE per pipeline, not once per stage."""
    if k > _PACK:
        raise ValueError(f"kmeans_fit: k={k} exceeds argmin packing bound {_PACK}")
    init = q.orderBy("vec_id").limit(k).collect()
    if not init:
        # fail cleanly (matches apportion_budget/hits_integer's empty-input
        # hardening) instead of an IndexError off a 0-d numpy array below
        raise ValueError("kmeans_fit: empty embeddings input")
    cmat = np.array([r["qv"] for r in init], dtype=np.int64)
    dim = cmat.shape[1]
    sum_cols = [F.sum(F.element_at("qv", d + 1)).alias(f"s{d}") for d in range(dim)]
    for _ in range(iters):
        asg = _assign(q, cmat).select("vec_id", "cluster")
        rows = (
            asg.join(q, "vec_id")
            .groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n"), *sum_cols)
            .collect()  # <= k rows by construction
        )
        nxt = cmat.copy()  # empty clusters keep their previous centroid
        for r in rows:
            sums = np.array([r[f"s{d}"] for d in range(dim)], dtype=np.int64)
            nxt[r["cluster"]] = _trunc_div(sums, r["n"])
        cmat = nxt
    return cmat


def kmeans_fit(embs: DataFrame, k: int = 8, iters: int = 2) -> np.ndarray:
    """Train k centroids with ``iters`` Lloyd updates; returns the k×d int64
    centroid matrix. Init = quantized vectors of the k smallest vec_ids
    (deterministic, oracle-reproducible)."""
    return _fit(_quantized(embs).localCheckpoint(), k, iters)


def kmeans_assign(embs: DataFrame, k: int = 8, iters: int = 2) -> DataFrame:
    """(vec_id, cluster, dist_q): final assignment against the trained
    centroids. ``dist_q`` is the exact int64 squared quantized distance.
    The quantized frame is materialized once and reused by training AND
    the final assignment pass."""
    q = _quantized(embs).localCheckpoint()
    return _assign(q, _fit(q, k, iters))


def semantic_dups(
    embs: DataFrame, k: int = 8, iters: int = 2, threshold: float = 0.4,
) -> DataFrame:
    """SemDeDup: (vec_id_a, vec_id_b, cluster, cos_q) near-dup pairs WITHIN
    k-means clusters — the cluster equi-join bounds the candidate space at
    Σ|cluster|² (pick k ~ N/1000 at corpus scale for ~constant cluster
    size), then the exact quantized cosine verifies. Recall vs the brute
    pair scan is the SemDeDup contract (cross-cluster near-dups are
    forfeit by design); the output itself is deterministic, so the gate
    oracle mirrors it exactly."""
    from .dedup import int_dot_udf

    q = _quantized(embs).localCheckpoint()  # one scan: fit + assign + verify
    asg = _assign(q, _fit(q, k, iters)).select("vec_id", "cluster")
    # norm/dot via the Arrow-batched exact-int64 kernel (bit-identical to
    # the interpreted zip_with fold, which HOF-evaluates per element —
    # measured 2x on the Σ|cluster|² pair-verify hot path at sf0.1)
    qn = q.withColumn(
        "norm", int_dot_udf(F.col("qv"), F.col("qv"))
    ).join(asg, "vec_id")
    a = qn.select(
        F.col("vec_id").alias("vec_id_a"), F.col("qv").alias("qa"),
        F.col("norm").alias("norm_a"), "cluster",
    )
    b = qn.select(
        F.col("vec_id").alias("vec_id_b"), F.col("qv").alias("qb"),
        F.col("norm").alias("norm_b"), "cluster",
    )
    cos = F.col("dot").cast("double") / F.sqrt(
        F.col("norm_a").cast("double") * F.col("norm_b").cast("double")
    )
    return (
        a.join(b, "cluster")
        .filter(F.col("vec_id_a") < F.col("vec_id_b"))
        .withColumn("dot", int_dot_udf(F.col("qa"), F.col("qb")))
        .withColumn("cos_q", F.round(cos, 6))
        .filter(F.col("cos_q") >= threshold)
        .select("vec_id_a", "vec_id_b", "cluster", "cos_q")
    )
