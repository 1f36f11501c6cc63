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
