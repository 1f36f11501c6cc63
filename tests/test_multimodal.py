"""Multimodal plumbing unit tests (functions/multimodal.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from dend_spark_data_lake_spark.functions import multimodal as MM
from dend_spark_data_lake_spark.sources.io import read_table


def test_decode_media_is_explicit_stub(spark):
    docs = read_table(spark, SF_SMOKE, "documents").limit(1)
    with pytest.raises(NotImplementedError):
        MM.decode_media(MM.to_media_table(docs))


def test_chunks_reassemble_to_payload(spark):
    docs = read_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 20)
    media = MM.to_media_table(docs)
    chunks = MM.chunk_payload(media, chunk_bytes=100)
    # per-doc sum of chunk sizes == payload size, and chunk indexes are dense
    agg = chunks.groupBy("doc_id").agg(
        F.sum("chunk_n_bytes").alias("total"),
        F.count("*").alias("n_chunks"),
        F.max("chunk_idx").alias("max_idx"),
    )
    joined = agg.join(media.select("doc_id", F.col("meta.n_bytes").alias("n_bytes")), "doc_id")
    bad = joined.filter(
        (F.col("total") != F.col("n_bytes"))
        | (F.col("max_idx") != F.col("n_chunks") - 1)
    ).count()
    assert bad == 0


def test_frame_sample_is_subset_of_chunks(spark):
    docs = read_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 20)
    media = MM.to_media_table(docs)
    frames = MM.sample_frames(media, frame_bytes=64, every_k=2)
    assert frames.filter(F.col("chunk_idx") % 2 != 0).count() == 0
    n_chunks = MM.chunk_payload(media, chunk_bytes=64).count()
    assert 0 < frames.count() < n_chunks
