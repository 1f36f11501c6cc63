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


def decode_media(media: DataFrame) -> DataFrame:
    """REAL media decode seam — intentionally unimplemented.

    Image/audio/video decoding requires codec libraries (PIL, ffmpeg,
    torchaudio) that are absent in this container by design. Callers that
    need real pixels/samples replace this one function; everything around
    it (schemas, batching, chunking, feature plumbing) is live and tested
    via the deterministic fakes above.
    """
    raise NotImplementedError(
        "media decoding requires codec libraries not present in this "
        "environment; use extract_features (deterministic fake) or plug a "
        "decoder into fake_decode_batch's seam"
    )


def chunk_payload(media: DataFrame, chunk_bytes: int = 256) -> DataFrame:
    """Split each binary payload into fixed-size byte windows — the audio
    chunking / video GOP-splitting primitive — as PURE JVM expressions:
    ``posexplode(sequence(...))`` for the window index and ``substring``
    (binary-typed) for the slice. No Python crossing, so chunking runs at
    scan speed and the 1→N row expansion stays pipelined (no shuffle).

    Emits (doc_id, chunk_idx, chunk, chunk_n_bytes, chunk_md5).
    """
    W = chunk_bytes
    n = F.coalesce(F.octet_length("payload"), F.lit(0))
    idx = F.when(n > 0, F.sequence(F.lit(0), F.floor((n - 1) / W).cast("int")))
    exploded = media.select(
        "doc_id", "payload", F.posexplode(idx).alias("chunk_idx", "_k")
    )
    chunk = F.expr(f"substring(payload, 1 + chunk_idx * {W}, {W})")
    return exploded.select(
        "doc_id",
        "chunk_idx",
        chunk.alias("chunk"),
        F.octet_length(chunk).cast("long").alias("chunk_n_bytes"),
        F.md5(chunk).alias("chunk_md5"),
    )


def sample_frames(media: DataFrame, frame_bytes: int = 256, every_k: int = 4) -> DataFrame:
    """Frame sampling: keep every k-th fixed-size window of the payload
    (the video keyframe-sampling access pattern). A composition over
    :func:`chunk_payload`, so it inherits the no-Python, no-shuffle plan.
    """
    return chunk_payload(media, frame_bytes).filter(
        F.col("chunk_idx") % every_k == 0
    )


HEX_SYMBOLS = "0123456789ABCDEF"


def payload_hex_entropy(payload: Column, round_digits: int = 6) -> Column:
    """Shannon entropy (bits/symbol) of a binary payload's 4-bit nibble
    stream — a codec-free corruption / compressibility signal: encrypted
    or already-compressed payloads sit near 4.0, text-like payloads well
    below, constant padding near 0. Works on OPAQUE bytes, so it runs
    where the real decoder (decode_media) cannot.

    Computed JVM-side with no explode: ``hex(payload)`` renders the
    nibble stream as uppercase hex (identical rendering in DuckDB), each
    of the 16 fixed symbols is counted via length-difference after
    replace, and the 16 entropy terms fold in a FIXED symbol order — so
    the floating sum is evaluated in the same order in any engine and the
    rounded value is reproducible.
    """
    h = F.hex(payload)
    n = F.length(h).cast("double")
    ent = F.lit(0.0)
    for s in HEX_SYMBOLS:
        c = (F.length(h) - F.length(F.replace(h, F.lit(s), F.lit("")))).cast("double")
        p = c / n
        ent = ent + F.when(c > 0, -p * F.log2(p)).otherwise(F.lit(0.0))
    return F.round(ent, round_digits)


def payload_hex_entropy_sql(payload_expr: str, round_digits: int = 6) -> str:
    """DuckDB rendering of :func:`payload_hex_entropy` — generated from
    the same symbol order so the term-fold order (and thus the rounded
    float) cannot drift."""
    terms = []
    for s in HEX_SYMBOLS:
        c = f"(length(hex({payload_expr})) - length(replace(hex({payload_expr}), '{s}', '')))"
        p = f"({c} * 1.0 / length(hex({payload_expr})))"
        terms.append(f"CASE WHEN {c} > 0 THEN -{p} * log2({p}) ELSE 0.0 END")
    return f"round({' + '.join(terms)}, {round_digits})"
