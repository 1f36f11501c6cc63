"""Multimodal (binary) column plumbing (SURVEY.md §2.5).

Images/audio/video are carried as opaque ``binary`` payload columns plus a
typed metadata struct; media decoding libraries are not available in this
environment, so the decode step is a deterministic fake behind a clearly
marked seam (``fake_decode_batch``) — the Spark-side plumbing (schema,
Arrow batching, ``mapInPandas`` signature, partition behavior) is real.

At scale: payloads ride in parquet binary columns; ``mapInPandas`` streams
Arrow record batches into Python, so peak memory is one batch (tune
``spark.sql.execution.arrow.maxRecordsPerBatch`` for large blobs), and the
work parallelizes per input partition with no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("media_type", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, byte_sum long, fake_width int, fake_height int"
)


def to_media_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Pack a text column into the binary media layout (payload + metadata).

    Stand-in for ingesting real media blobs (e.g. via
    ``spark.read.format("binaryFile")``); keeps types and structure honest.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.lit("text/plain").alias("media_type"),
        ).alias("meta"),
    )


def fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for a media decoder.

    A real implementation would decode image/audio bytes here (PIL, ffmpeg,
    torchaudio, ...) — those libs are absent in this container, so we derive
    stable pseudo-features from the raw bytes instead. Raises nothing and
    needs no I/O, so the surrounding Spark plan is fully exercised.
    """
    payloads = pdf["payload"]
    n_bytes = payloads.map(lambda b: len(b) if b is not None else 0)
    byte_sum = payloads.map(lambda b: int(sum(b)) if b is not None else 0)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "n_bytes": n_bytes.astype("int64"),
            "byte_sum": byte_sum,
            "fake_width": (byte_sum % 1920).astype("int32"),
            "fake_height": (n_bytes % 1080).astype("int32"),
        }
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield fake_decode_batch(pdf)

    return media.select("doc_id", "payload").mapInPandas(run, schema=FEATURE_SCHEMA)
