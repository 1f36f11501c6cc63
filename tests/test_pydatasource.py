"""Custom Python Data Source (Spark 4 API): registration, parallel
partition planning, deterministic re-reads, and filter-pushdown partition
pruning must all hold — this is the connector contract a production
Python source has to meet."""

from __future__ import annotations

from dend_spark_data_lake_spark.sources.pydatasource import register


def _read(spark, **opts):
    reader = spark.read.format("synthdocs")
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


def test_reads_planned_partitions_and_is_deterministic(spark):
    register(spark)
    df = _read(spark, rows=1000, partitions=8)
    assert df.count() == 1000
    assert df.rdd.getNumPartitions() == 8
    assert [f.name for f in df.schema.fields] == ["doc_id", "lang", "text"]
    # distinct ids, deterministic content across independent reads
    assert df.select("doc_id").distinct().count() == 1000
    a = sorted(df.collect())
    b = sorted(_read(spark, rows=1000, partitions=8).collect())
    assert a == b


def test_filter_pushdown_prunes_partitions(spark):
    register(spark)
    df = _read(spark, rows=1000, partitions=10)
    narrow = df.filter("doc_id >= 100 AND doc_id < 150")
    rows = narrow.collect()
    assert sorted(r.doc_id for r in rows) == list(range(100, 150))
    # the 50-id range must plan FEWER input partitions than the full scan:
    # pushFilters narrowed [lo, hi) before partitions() split it
    assert narrow.rdd.getNumPartitions() < 10
    # equality collapses to a single planned partition
    one = df.filter("doc_id = 7")
    assert [r.doc_id for r in one.collect()] == [7]
    assert one.rdd.getNumPartitions() == 1


def test_spark_reapplies_returned_filters(spark):
    register(spark)
    df = _read(spark, rows=100, partitions=4)
    # a non-range predicate is not pushable: source yields it back and
    # Spark evaluates it post-scan
    assert df.filter("lang = 'en'").count() == 20


def test_jsonlshards_write_creates_shards_and_manifest(spark, tmp_path):
    """The Python data-source WRITER: partition-parallel JSONL shards,
    published atomically via the _SUCCESS manifest; round-trip equals the
    input."""
    import json
    import os

    register(spark)
    out = str(tmp_path / "shards")
    df = spark.range(0, 100, 1, 4).selectExpr(
        "id AS doc_id", "CAST(id % 5 AS STRING) AS lang"
    )
    df.write.format("jsonlshards").option("path", out).mode("append").save()

    shards = sorted(f for f in os.listdir(out) if f.startswith("shard-"))
    assert shards, os.listdir(out)
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert sum(s["rows"] for s in manifest["shards"]) == 100
    assert {s["shard"] for s in manifest["shards"]} == set(shards)
    # no staging residue
    assert not os.path.isdir(os.path.join(out, "_staging"))
    # round-trip
    back = spark.read.json(os.path.join(out, "shard-*.jsonl"))
    assert back.count() == 100
    assert {r.doc_id for r in back.collect()} == set(range(100))


def test_jsonlshards_overwrite_replaces_previous_output(spark, tmp_path):
    import json
    import os

    register(spark)
    out = str(tmp_path / "shards2")
    spark.range(0, 10).selectExpr("id AS doc_id").write.format(
        "jsonlshards"
    ).option("path", out).mode("append").save()
    spark.range(0, 3).selectExpr("id AS doc_id").write.format(
        "jsonlshards"
    ).option("path", out).mode("overwrite").save()
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert sum(s["rows"] for s in manifest["shards"]) == 3
    back = spark.read.json(os.path.join(out, "shard-*.jsonl"))
    assert back.count() == 3


def test_stream_reader_delivers_exactly_once(spark, tmp_path):
    """The streaming side of synthdocs must deliver every doc_id in
    [0, rows) exactly once across rate-limited microbatches, with
    content identical to the batch read — determinism-by-doc_id is what
    turns task retries into exactly-once delivery."""
    register(spark)
    q = (
        spark.readStream.format("synthdocs")
        .option("rows", 120)
        .option("rows_per_batch", 50)
        .option("partitions", 3)
        .load()
        .writeStream.format("memory")
        .queryName("synthstream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM synthstream").collect()
    assert sorted(r.doc_id for r in got) == list(range(120))
    batch = spark.read.format("synthdocs").option("rows", 120).load()
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch.collect()))


def test_stream_reader_resumes_from_checkpoint(spark, tmp_path):
    """A restarted query must resume from the checkpointed offset, not
    replay from zero: first run drains 60 docs, the rerun (same
    checkpoint, higher cap) must add exactly the NEXT 60 — no overlap,
    no gap."""
    register(spark)
    ckpt = str(tmp_path / "ckpt2")
    out = str(tmp_path / "out")

    def run(rows_cap):
        q = (
            spark.readStream.format("synthdocs")
            .option("rows", rows_cap)
            .option("rows_per_batch", 25)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run(60)
    first = spark.read.parquet(out).collect()
    assert sorted(r.doc_id for r in first) == list(range(60))
    run(120)
    merged = spark.read.parquet(out).collect()
    # the restarted query appended ONLY the un-delivered tail: every id
    # exactly once across both runs
    assert sorted(r.doc_id for r in merged) == list(range(120))


def test_stream_reader_offset_never_regresses_regardless_of_call_order():
    """ADVICE r4 + r5: a restarted reader whose first offset-bearing
    callback is partitions() or commit() must not report an offset below
    the checkpoint — the reader folds BOTH partition bounds and the
    commit position into a high-water mark and reports from max(cursor,
    seen). The one ordering the mark cannot cover (clean restart whose
    very first callback is latestOffset) is safe by the engine contract:
    Spark maxes the report with its own offset log, and partitions()
    only ever receives engine-validated ranges."""
    from dend_spark_data_lake_spark.sources.pydatasource import (
        _SynthDocsStreamReader,
    )

    # ordering A (what Spark 4.1 does): partitions() first, then latest
    r = _SynthDocsStreamReader({"rows": "1000", "rows_per_batch": "100"})
    r.partitions({"offset": 0}, {"offset": 500})
    assert r.latestOffset()["offset"] == 600

    # ordering A': the checkpoint arrives via the START bound only (an
    # empty replan range) — ADVICE r5: start must be folded in too
    r1b = _SynthDocsStreamReader({"rows": "1000", "rows_per_batch": "100"})
    r1b.partitions({"offset": 500}, {"offset": 500})
    assert r1b.latestOffset()["offset"] == 600

    # ordering B (the ADVICE hazard): only commit() has run when
    # latestOffset is asked — the report must still clear the checkpoint
    r2 = _SynthDocsStreamReader({"rows": "1000", "rows_per_batch": "100"})
    r2.commit({"offset": 500})
    assert r2.latestOffset()["offset"] == 600

    # saturation at the rows cap still holds, and the offset stays
    # monotone across repeated latestOffset calls
    r3 = _SynthDocsStreamReader({"rows": "150", "rows_per_batch": "100"})
    assert r3.latestOffset()["offset"] == 100
    assert r3.latestOffset()["offset"] == 150
    assert r3.latestOffset()["offset"] == 150
    r3.commit({"offset": 150})
    assert r3.latestOffset()["offset"] == 150
