"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with struct metadata; decode /
feature-extract / frame-sample are ``mapInPandas`` stages. The decode step is
STUBBED (no codec libraries in this container — FIXTURES/driver contract):
``_decode_real`` raises NotImplementedError unless PIL/soundfile import, and
the pipeline uses a deterministic fake decode instead. The Spark-side
plumbing — schema, batch iteration, partition shape — is real and tested.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def payloads_df(docs: DataFrame) -> DataFrame:
    """Stand-in payload table: utf-8 bytes of text as the opaque binary.
    At production this is the real media bytes column of the Iceberg table."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
    )


def _decode_real(payload: bytes):
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "real media decode requires PIL/soundfile; not available in this "
            "container — use decode_meta (deterministic fake) instead"
        ) from exc


META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("magic", T.IntegerType()),
    T.StructField("fake_width", T.IntegerType()),
    T.StructField("fake_height", T.IntegerType()),
])


def decode_meta(payloads: DataFrame) -> DataFrame:
    """Deterministic fake decode: metadata derived purely from the bytes.
    Arrow-batched; the batch shape is exactly what a real decoder would use."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pl = pdf["payload"]
            n_bytes = pl.map(len).astype("int32")
            magic = pl.map(lambda b: b[0] if len(b) else 0).astype("int32")
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": n_bytes,
                "magic": magic,
                "fake_width": (n_bytes % 640).astype("int32"),
                "fake_height": (magic % 480).astype("int32"),
            })

    return payloads.select("doc_id", "payload").mapInPandas(run, META_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_hash", T.LongType()),
])


def frame_sample(payloads: DataFrame, n_frames: int = 4) -> DataFrame:
    """Fake frame sampler: n_frames evenly spaced 64-byte windows per payload,
    each hashed deterministically. The real thing swaps the hash for a codec
    call; the explode/partition/batch shape is identical."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_hash = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                step = max(1, len(b) // n_frames)
                for i in range(n_frames):
                    win = b[i * step: i * step + 64]
                    h = 0
                    for v in win:
                        h = (h * 131 + v) % ((1 << 61) - 1)
                    out_doc.append(doc_id)
                    out_idx.append(i)
                    out_hash.append(h)
            yield pd.DataFrame({
                "doc_id": pd.Series(out_doc, dtype="int64"),
                "frame_idx": pd.Series(out_idx, dtype="int32"),
                "frame_hash": pd.Series(out_hash, dtype="int64"),
            })

    return payloads.select("doc_id", "payload").mapInPandas(run, FRAME_SCHEMA)
