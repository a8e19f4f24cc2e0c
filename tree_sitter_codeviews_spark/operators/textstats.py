"""Text analysis for training-data pipelines: token stats, quality scoring,
language-ID heuristic, document fingerprinting. Hot paths native; langid and
fingerprint are Arrow-batched pandas UDFs (dictionary/stateful logic)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

STOPWORDS = ("the", "a")


def token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_distinct) — native split/array ops, no shuffle."""
    w = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(w).alias("n_tokens"),
        F.size(F.array_distinct(w)).alias("n_distinct"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars_out, n_tokens, avg_token_len, stopword_ratio,
    distinct_ratio) — the usual cheap quality heuristics, all native."""
    w = F.split(F.col("text"), " ")
    n_tok = F.size(w)
    sum_len = F.aggregate(
        F.transform(w, lambda t: F.length(t)), F.lit(0), lambda acc, v: acc + v
    )
    n_stop = F.size(F.filter(w, lambda t: t.isin(*STOPWORDS)))
    return docs.select(
        "doc_id",
        F.length(F.col("text")).alias("n_chars_out"),
        n_tok.alias("n_tokens"),
        F.round(sum_len * F.lit(1.0) / n_tok, 6).alias("avg_token_len"),
        F.round(n_stop * F.lit(1.0) / n_tok, 6).alias("stopword_ratio"),
        F.round(F.size(F.array_distinct(w)) * F.lit(1.0) / n_tok, 6).alias("distinct_ratio"),
    )


def lang_stats(docs: DataFrame) -> DataFrame:
    """(lang, n_docs, avg_chars) rollup of the declared-language column."""
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(F.col("n_chars")), 6).alias("avg_chars"),
    )


# --- language-ID heuristic (char n-gram profile) ---------------------------

_PROFILES = {
    # tiny per-language trigram marker sets (public-knowledge heuristics)
    "en": (" th", "the", "ing", " an"),
    "de": ("der", "ein", "sch", " un"),
    "fr": (" le", "les", "ent", " de"),
    "es": (" el", " de", "ción", "los"),
    "pt": (" os", "ção", " um", " de"),
    "zh": (),  # CJK detected by codepoint range
}


@pandas_udf(T.StringType())
def langid_udf(text: pd.Series) -> pd.Series:
    def one(t: str) -> str:
        if t is None or not t:
            return "und"
        if any("一" <= ch <= "鿿" for ch in t[:200]):
            return "zh"
        scores = {
            lang: sum(t.count(g) for g in grams)
            for lang, grams in _PROFILES.items()
            if grams
        }
        best = max(scores, key=lambda k: (scores[k], k))
        return best if scores[best] > 0 else "und"

    return text.map(one)


def langid(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id", "lang", langid_udf(F.col("text")).alias("pred_lang"))


# --- document fingerprint (polynomial rolling hash) -------------------------

_FP_BASE = np.uint64(1000003)
_FP_MOD = np.uint64((1 << 61) - 1)


def fingerprint_py(text: str) -> int:
    """Reference scalar implementation (tests)."""
    fp = 0
    for tok in text.split(" "):
        th = 0
        for ch in tok.encode("utf-8"):
            th = (th * 131 + ch) % ((1 << 61) - 1)
        fp = (fp * 1000003 + th) % ((1 << 61) - 1)
    return fp


@pandas_udf(T.LongType())
def fingerprint_udf(text: pd.Series) -> pd.Series:
    def one(t: str) -> int:
        return fingerprint_py(t) if t is not None else 0

    return text.map(one)


def fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fingerprint): order-sensitive rolling hash — two docs with the
    same token multiset but different order get different prints (unlike the
    shingle methods)."""
    return docs.select("doc_id", fingerprint_udf(F.col("text")).alias("fingerprint"))
