"""Named queries: the engine's public query surface.

Each function takes (spark, sf_dir) and returns a DataFrame whose row set,
schema and values match the DuckDB oracle of the same name in ``oracle.py``
(driver correctness gate). Column names are aliased identically on both
sides (the driver's compare sorts columns by name before hashing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import cells, layers
from .operators import extract, knn, pip_join, tiles
from .sources import pages as pages_src


# ---------------------------------------------------------------------------
# geo suite
# ---------------------------------------------------------------------------

def geo_cell_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, res, cell_id) at res 7..10 — one scan, parents by truncation."""
    pts = pages_src.doc_points_df(spark, sf_dir)
    c10 = cells.morton_col(F.col("gx"), F.col("gy"), layers.GRID_RES)
    levels = F.array(*[
        F.struct(
            F.lit(r).alias("res"),
            F.shiftright(c10, 2 * (layers.GRID_RES - r)).alias("cell_id"),
        )
        for r in range(7, 11)
    ])
    return pts.select("doc_id", F.explode(levels).alias("l")).select(
        "doc_id", "l.res", "l.cell_id"
    )


def geo_s2_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, level, cell_id) at S2-style Hilbert levels 12..16.

    Finest level encoded once via the vectorized Arrow UDF; coarser levels by
    truncation (the Hilbert curve is self-similar — ``s2.py``)."""
    from . import s2

    pts = pages_src.doc_points_df(spark, sf_dir)
    x16 = s2.upscale_grid_col(F.col("gx"), layers.GRID_RES, s2.S2_RES)
    y16 = s2.upscale_grid_col(F.col("gy"), layers.GRID_RES, s2.S2_RES)
    h = pts.withColumn("h16", s2.hilbert_udf(s2.S2_RES)(x16, y16))
    levels = F.array(*[
        F.struct(
            F.lit(lvl).alias("level"),
            s2.hilbert_at_level_col(F.col("h16"), lvl).alias("cell_id"),
        )
        for lvl in s2.S2_LEVELS
    ])
    return h.select("doc_id", F.explode(levels).alias("l")).select(
        "doc_id", "l.level", "l.cell_id"
    )


def geo_pip_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = pages_src.doc_points_df(spark, sf_dir).withColumn(
        "cell", cells.morton_col(F.col("gx"), F.col("gy"), layers.GRID_RES)
    )
    return pip_join.pip_join(pts, spark, keys=("doc_id",)).select(
        "doc_id", "cell_id", "polygon_id"
    )


def geo_pip_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = pages_src.doc_points_df(spark, sf_dir).withColumn(
        "cell", cells.morton_col(F.col("gx"), F.col("gy"), layers.GRID_RES)
    )
    joined = pip_join.pip_join(pts, spark, keys=("doc_id",))
    return pip_join.pip_best(joined, keys=("doc_id",)).select(
        "doc_id", "cell_id", "polygon_id", "admin_level"
    )


def geo_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = pages_src.pages_df(spark, sf_dir)
    gaz = pages_src.gazetteer_df(spark)
    return extract.page_entities(pages, gaz).select(
        "url", "entity_id", "surface", "char_offset", "lon", "lat"
    )


def geo_pip_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: pages -> extract -> encode -> two-phase PIP -> triples."""
    pages = pages_src.pages_df(spark, sf_dir)
    gaz = pages_src.gazetteer_df(spark)
    ents = extract.page_entities(pages, gaz)
    joined = pip_join.pip_join(ents, spark, keys=("url",))
    return joined.select("url", "cell_id", "polygon_id").distinct()


def geo_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = pages_src.doc_points_df(spark, sf_dir)
    return tiles.tile_counts(pts, res_lo=7, res_hi=10, grid_res=layers.GRID_RES)


def geo_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = pages_src.doc_points_df(spark, sf_dir)
    return knn.knn_ring(pts, spark, k=5, res=5)


def geo_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(url, text_out) — the byte-identical extraction invariant, checked
    value-for-value against an oracle that reconstructs the text directly."""
    pages = pages_src.pages_df(spark, sf_dir)
    return extract.extract_pages(pages).select("url", "text_out")


# ---------------------------------------------------------------------------
# web-text / training-data pipeline suite
# ---------------------------------------------------------------------------

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.testdata import load_table

    return load_table(spark, sf_dir, "documents")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.testdata import load_table

    return load_table(spark, sf_dir, "embeddings")


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dedup

    return dedup.exact_dup_groups(_docs(spark, sf_dir))


def dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dedup

    return dedup.jaccard_pairs_exact(_docs(spark, sf_dir), n=3, threshold=0.5)


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dedup

    return dedup.minhash_lsh_dups(_docs(spark, sf_dir), n=3, threshold=0.5)


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dedup

    return dedup.simhash_near_dups(_docs(spark, sf_dir), max_hamming=3)


def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dedup

    return dedup.embedding_near_dups(_embs(spark, sf_dir), threshold=0.95)


def ann_topk_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import ann

    return ann.topk_quantized(_embs(spark, sf_dir), k=10, every=50)


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import ann

    return ann.topk_cosine_pandas(_embs(spark, sf_dir), k=10, every=50)


def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import textstats

    df = textstats.token_stats(_docs(spark, sf_dir))
    return df.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
    )


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import textstats

    df = textstats.quality_scores(_docs(spark, sf_dir))
    return df.select(
        "doc_id",
        F.col("n_chars_out").cast("long").alias("n_chars_out"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "avg_token_len", "stopword_ratio", "distinct_ratio",
    )


def lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import textstats

    return textstats.lang_stats(_docs(spark, sf_dir))


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import textstats

    return textstats.langid(_docs(spark, sf_dir))


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import textstats

    return textstats.fingerprints(_docs(spark, sf_dir))


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import multimodal

    return multimodal.decode_meta(multimodal.payloads_df(_docs(spark, sf_dir)))


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import multimodal

    return multimodal.frame_sample(multimodal.payloads_df(_docs(spark, sf_dir)))
