"""I/O surface tests (SURVEY.md §2.1 S1-S4 + scale posture):

- partitioned parquet round-trip with reader-side partition pruning;
- dynamic partition overwrite (defect D4 fix: idempotent reruns that
  replace only the partitions present in the new write);
- JSON-lines with explicit schema + PERMISSIVE corrupt-row capture;
- bucketed tables whose equi-join plans with NO shuffle exchange.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dend_spark_data_lake_spark.sources.io import (
    read_csv,
    read_json_lines,
    read_table,
    write_bucketed_table,
    write_parquet,
)

SF = "/root/testdata/sf0.001"


def test_partitioned_roundtrip_and_pruning(spark, tmp_path):
    orders = read_table(spark, SF, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_part")
    write_parquet(orders, path, partition_by=["o_year"])
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    assert set(back.columns) == set(orders.columns)
    # a filter on the partition column must prune at the source, not scan+filter
    plan = back.filter(F.col("o_year") == 1995)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_year" in plan


def test_dynamic_partition_overwrite(spark, tmp_path):
    path = str(tmp_path / "dpo")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, p string")
    write_parquet(df1, path, partition_by=["p"])
    # overwrite ONLY partition p='b'; p='a' must survive (dynamic mode —
    # static overwrite would drop the whole table)
    df2 = spark.createDataFrame([(99, "b")], "id long, p string")
    write_parquet(df2, path, partition_by=["p"])
    got = {(r.id, r.p) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a"), (99, "b")}


def test_json_roundtrip_explicit_schema_and_corrupt_rows(spark, tmp_path):
    path = str(tmp_path / "j")
    (tmp_path / "j").mkdir()
    (tmp_path / "j" / "part-0.json").write_text(
        '{"id": 1, "name": "ok"}\n'
        '{"id": 2, "name": "also ok"}\n'
        "this is not json\n"
    )
    df = read_json_lines(
        spark, path, schema="id long, name string, _corrupt_record string"
    )
    rows = df.collect()
    assert len(rows) == 3
    good = [r for r in rows if r._corrupt_record is None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert {(r.id, r.name) for r in good} == {(1, "ok"), (2, "also ok")}
    assert len(bad) == 1 and bad[0].id is None


def test_csv_roundtrip(spark, tmp_path):
    nation = read_table(spark, SF, "nation")
    path = str(tmp_path / "nation_csv")
    nation.write.mode("overwrite").option("header", "true").csv(path)
    back = read_csv(spark, path, schema=nation.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    li = read_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    o = read_table(spark, SF, "orders").select("o_orderkey", "o_orderpriority")
    write_bucketed_table(li, "li_b", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    write_bucketed_table(o, "o_b", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    # hint("merge") forces SortMergeJoin — at test scale Catalyst would
    # broadcast instead (and skip bucketing); at 100 TB neither side is
    # broadcastable and SMJ-over-buckets is exactly the plan in play
    j = spark.table("li_b").hint("merge").join(
        spark.table("o_b"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan
    assert j.count() == li.count()
    spark.sql("DROP TABLE li_b")
    spark.sql("DROP TABLE o_b")


def test_parquet_schema_evolution_merge(spark, tmp_path):
    # Day 1 writes (k, v); day 2 adds a column. mergeSchema reads must see
    # the union schema with nulls for the missing column — the add-a-column
    # evolution path a long-lived lake table WILL hit.
    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], ["k", "v"]).write.parquet(path + "/d=1")
    spark.createDataFrame([(2, "b", 9.5)], ["k", "v", "score"]).write.parquet(
        path + "/d=2"
    )
    df = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(df.columns) == {"k", "v", "score", "d"}
    rows = {r.k: (r.v, r.score) for r in df.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}


def test_events_ts_reads_identically_across_encodings(spark, tmp_path):
    """The driver has shipped events.ts as both TIMESTAMP(NANOS) (read as
    a nanos long under the legacy conf) and plain micros TIMESTAMP across
    rounds; read_table must yield identical values either way."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from dend_spark_data_lake_spark.sources.io import read_table

    micros = [1_700_000_000_000_000, 1_700_000_123_456_789]
    base = {
        "event_id": [1, 2],
        "user_id": [10, 20],
        "event_type": ["a", "b"],
        "value": [1.0, 2.0],
        "props": ["{}", "{}"],
    }
    nanos_dir = tmp_path / "nanos"
    micros_dir = tmp_path / "micros"
    for d in (nanos_dir, micros_dir):
        d.mkdir()
    pq.write_table(
        pa.table({**base, "ts": pa.array([m * 1000 for m in micros], pa.timestamp("ns"))}),
        str(nanos_dir / "events.parquet"),
    )
    pq.write_table(
        pa.table({**base, "ts": pa.array(micros, pa.timestamp("us"))}),
        str(micros_dir / "events.parquet"),
    )
    a = sorted(
        (r.event_id, r.ts) for r in read_table(spark, str(nanos_dir), "events").collect()
    )
    b = sorted(
        (r.event_id, r.ts) for r in read_table(spark, str(micros_dir), "events").collect()
    )
    assert a == b and len(a) == 2
