"""API-surface tests: ORC/text sources, mapInArrow, Observation metrics.

These lock the secondary I/O formats and the Arrow-native UDF path; the
primary parquet surface is covered in test_io.py and the oracle suite.
"""

from __future__ import annotations

from pyspark.sql import Observation, Row, functions as F

from dend_spark_data_lake_spark.sources.io import (
    read_orc,
    read_text_lines,
    write_orc,
)
from dend_spark_data_lake_spark.functions.udfs import token_count_arrow


def test_orc_roundtrip_partitioned(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 2024), (2, "b", 2024), (3, "c", 2025)], ["k", "v", "year"]
    )
    path = str(tmp_path / "orc_tbl")
    write_orc(df, path, partition_by=["year"])
    back = read_orc(spark, path)
    assert {(r.k, r.v, r.year) for r in back.collect()} == {
        (1, "a", 2024), (2, "b", 2024), (3, "c", 2025)
    }
    # partition pruning reaches the ORC scan
    plan = back.filter(F.col("year") == 2025)._jdf.queryExecution().executedPlan().toString()
    assert "year" in plan
    # overwrite mode is idempotent (reference defect D4 stays fixed for ORC too)
    write_orc(df, path, partition_by=["year"])
    assert read_orc(spark, path).count() == 3


def test_text_lines_and_wholetext(spark, tmp_path):
    p = tmp_path / "corpus"
    p.mkdir()
    (p / "a.txt").write_text("line one\nline two\n")
    (p / "b.txt").write_text("only line\n")
    lines = read_text_lines(spark, str(p))
    assert sorted(r.value for r in lines.collect()) == [
        "line one", "line two", "only line"
    ]
    whole = read_text_lines(spark, str(p), whole_file=True)
    assert whole.count() == 2
    assert {r.value.strip().splitlines()[0] for r in whole.collect()} == {
        "line one", "only line"
    }


def test_map_in_arrow_token_count_matches_builtin(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a b  c"), Row(doc_id=2, text="  x "), Row(doc_id=3, text="one")]
    )
    got = {r.doc_id: r.n_tokens for r in token_count_arrow(df, "doc_id", "text").collect()}
    assert got == {1: 3, 2: 1, 3: 1}


def test_observation_collects_metrics_without_extra_pass(spark):
    obs = Observation("stats")
    df = spark.range(100).observe(
        obs, F.count(F.lit(1)).alias("rows"), F.sum("id").alias("total")
    )
    assert df.count() == 100
    assert obs.get == {"rows": 100, "total": 4950}


def test_xml_roundtrip(spark, tmp_path):
    from dend_spark_data_lake_spark.sources.io import read_xml, write_xml

    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    path = str(tmp_path / "xml_tbl")
    write_xml(df, path, row_tag="row")
    back = read_xml(spark, path, row_tag="row")
    assert {(r.k, r.v) for r in back.collect()} == {(1, "a"), (2, "b")}


def test_binary_file_source_reads_payload_and_metadata(spark, tmp_path):
    from dend_spark_data_lake_spark.sources.io import read_binary_files

    p = tmp_path / "blobs"
    p.mkdir()
    (p / "a.bin").write_bytes(b"\x00\x01\x02payload")
    (p / "b.txt").write_bytes(b"not a blob")
    df = read_binary_files(spark, str(p), glob="*.bin")
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.path.endswith("a.bin")
    assert bytes(r.content) == b"\x00\x01\x02payload"
    assert r.length == 10
