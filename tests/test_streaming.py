"""Structured Streaming tests: stream results must equal the batch twins on
the same input; watermarks must drop too-late rows; streaming dedup must
drop in-horizon repeats."""

from __future__ import annotations

from datetime import datetime

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dend_spark_data_lake_spark.streaming.windows import (
    dedup_stream,
    read_event_stream,
    run_available_now,
    session_agg,
    tumbling_agg,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write_file(spark, rows, path):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(path)


def _write_single_file(spark, rows, path):
    """Produce ONE parquet file at ``path`` (the streaming file source does
    not recurse into per-write output directories)."""
    import glob
    import os
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp()
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(tmp + "/out")
    part = glob.glob(tmp + "/out/part-*.parquet")[0]
    os.makedirs(os.path.dirname(path), exist_ok=True)
    shutil.copy(part, path)
    shutil.rmtree(tmp)


def _ts(h, m=0):
    return datetime(2024, 3, 1, h, m)


@pytest.fixture()
def stream_dir(spark, tmp_path):
    return tmp_path


def test_tumbling_stream_equals_batch(spark, tmp_path):
    rows = [
        (1, _ts(10, 5), 1, 10.0),
        (2, _ts(10, 55), 2, 5.0),
        (3, _ts(11, 10), 1, 2.5),
        (4, _ts(12, 1), 3, 1.0),
    ]
    src = str(tmp_path / "src")
    _write_file(spark, rows, src)
    stream = read_event_stream(spark, src, SCHEMA)
    run_available_now(
        tumbling_agg(stream), "tumb", "complete", str(tmp_path / "ckpt")
    )
    got = sorted(tuple(r) for r in spark.table("tumb").collect())
    batch = (
        spark.read.schema(SCHEMA).parquet(src)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("v"))
        .select(F.col("w.start"), "n", "v")
    )
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want
    assert got == [(_ts(10), 2, 15.0), (_ts(11), 1, 2.5), (_ts(12), 1, 1.0)]


def test_session_stream(spark, tmp_path):
    rows = [
        (1, _ts(9, 0), 1, 1.0),
        (2, _ts(9, 10), 1, 1.0),   # same session (gap 10m < 30m)
        (3, _ts(10, 30), 1, 1.0),  # new session (gap 80m)
        (4, _ts(9, 5), 2, 1.0),
    ]
    src = str(tmp_path / "src")
    _write_file(spark, rows, src)
    stream = read_event_stream(spark, src, SCHEMA)
    run_available_now(session_agg(stream), "sess", "complete", str(tmp_path / "ckpt"))
    got = sorted(tuple(r) for r in spark.table("sess").collect())
    assert got == [
        (1, _ts(9, 0), _ts(9, 40), 2),
        (1, _ts(10, 30), _ts(11, 0), 1),
        (2, _ts(9, 5), _ts(9, 35), 1),
    ]


def test_dedup_stream_drops_repeats(spark, tmp_path):
    f1 = str(tmp_path / "src/f1.parquet")
    f2 = str(tmp_path / "src/f2.parquet")
    _write_single_file(spark, [(1, _ts(10, 0), 1, 1.0), (2, _ts(10, 1), 1, 2.0)], f1)
    # event_id=1 repeats in a later file within the watermark horizon
    _write_single_file(spark, [(1, _ts(10, 2), 1, 1.0), (3, _ts(10, 3), 2, 3.0)], f2)
    stream = read_event_stream(spark, str(tmp_path / "src"), SCHEMA, max_files_per_trigger=1)
    run_available_now(
        dedup_stream(stream, ["event_id"]), "dedup", "append", str(tmp_path / "ckpt")
    )
    ids = sorted(r.event_id for r in spark.table("dedup").collect())
    assert ids == [1, 2, 3]


def test_watermark_drops_late_rows(spark, tmp_path):
    # append mode: the watermark drops too-late input and finalizes windows.
    # NOTE the one-batch lag (verified empirically): the filter in batch N
    # uses the watermark computed from batch N-1's data — the value shown in
    # that batch's progress is the post-batch update. Hence the filler file
    # between the on-time data and the late arrival.
    import time

    src = tmp_path / "src"
    # batch 0: on-time data; after it the watermark is 12:00 - 2h = 10:00
    _write_single_file(spark, [(1, _ts(12, 0), 1, 1.0), (2, _ts(11, 30), 1, 1.0)], str(src / "f1.parquet"))
    time.sleep(1.05)  # file source orders batches by modification time
    # batch 1: filler — runs with wm 10:00, advances it to 11:00
    _write_single_file(spark, [(9, _ts(13, 0), 2, 1.0)], str(src / "f2.parquet"))
    time.sleep(1.05)
    # batch 2 (wm 11:00): 07:00 window end 08:00 <= wm → dropped;
    # 11:45 window end 12:00 > wm → still aggregated
    _write_single_file(spark, [(3, _ts(7, 0), 1, 100.0), (4, _ts(11, 45), 1, 1.0)], str(src / "f3.parquet"))
    time.sleep(1.05)
    # batch 3 pushes the watermark to 18:00, finalizing all open windows
    _write_single_file(spark, [(5, _ts(20, 0), 1, 1.0)], str(src / "f4.parquet"))
    stream = read_event_stream(spark, str(src), SCHEMA, max_files_per_trigger=1)
    run_available_now(
        tumbling_agg(stream, watermark="2 hours"), "late", "append", str(tmp_path / "ckpt")
    )
    got = {tuple(r) for r in spark.table("late").collect()}
    assert got == {(_ts(11), 2, 2.0), (_ts(12), 1, 1.0), (_ts(13), 1, 1.0)}


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps per-key state across microbatches: the
    final totals must equal the batch groupBy over ALL input, not just the
    last file."""
    from dend_spark_data_lake_spark.streaming.stateful import running_user_totals

    src = str(tmp_path / "src")
    _write_single_file(
        spark,
        [(1, _ts(9), 1, 10.0), (2, _ts(9, 5), 2, 5.0)],
        src + "/a.parquet",
    )
    _write_single_file(
        spark,
        [(3, _ts(10), 1, 7.5), (4, _ts(10, 5), 1, 2.5), (5, _ts(10, 10), 2, 1.0)],
        src + "/b.parquet",
    )
    stream = read_event_stream(spark, src, SCHEMA, max_files_per_trigger=1)
    out = running_user_totals(stream.select("user_id", "value"))
    run_available_now(out, "stateful_totals", "update", str(tmp_path / "ck"))
    # update mode appends one row per (key, microbatch); the final state is
    # the row with the max n_events per key
    rows = spark.sql(
        """SELECT user_id, max_by(total_value, n_events) AS total_value,
                  max(n_events) AS n_events
           FROM stateful_totals GROUP BY user_id"""
    ).collect()
    got = {r.user_id: (r.n_events, r.total_value) for r in rows}
    assert got == {1: (3, 20.0), 2: (2, 6.0)}
    # state really spanned batches: user 1 must have an intermediate row
    inter = spark.sql(
        "SELECT count(*) AS c FROM stateful_totals WHERE user_id = 1"
    ).collect()[0].c
    assert inter == 2


def test_stateful_running_totals_string_key(spark, tmp_path):
    """The output schema's key field derives from the input schema —
    a STRING group key must round-trip unchanged (r3 regression class:
    the key type was hardcoded bigint, which mis-declared string keys)."""
    from dend_spark_data_lake_spark.streaming.stateful import running_user_totals

    str_schema = T.StructType(
        [
            T.StructField("user_id", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    src = str(tmp_path / "src")

    def write_one(rows, path):
        import glob
        import os
        import shutil
        import tempfile

        tmp = tempfile.mkdtemp()
        spark.createDataFrame(rows, str_schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp + "/out")
        part = glob.glob(tmp + "/out/part-*.parquet")[0]
        os.makedirs(os.path.dirname(path), exist_ok=True)
        shutil.copy(part, path)
        shutil.rmtree(tmp)

    write_one([("alice", 10.0), ("bob", 5.0)], src + "/a.parquet")
    write_one([("alice", 7.5), ("alice", 2.5)], src + "/b.parquet")
    stream = (
        spark.readStream.schema(str_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = running_user_totals(stream)
    assert out.schema["user_id"].dataType == T.StringType()
    run_available_now(out, "stateful_str", "update", str(tmp_path / "ck"))
    rows = spark.sql(
        """SELECT user_id, max_by(total_value, n_events) AS total_value,
                  max(n_events) AS n_events
           FROM stateful_str GROUP BY user_id"""
    ).collect()
    got = {r.user_id: (r.n_events, r.total_value) for r in rows}
    assert got == {"alice": (3, 20.0), "bob": (1, 5.0)}


def test_stream_static_enrich_equals_batch_join(spark, stream_dir):
    from dend_spark_data_lake_spark.streaming.windows import enrich_with_static

    rows = [
        (1, _ts(9), 100, 1.0),
        (2, _ts(10), 200, 2.0),
        (3, _ts(11), 999, 3.0),  # no dim match -> left join keeps it
    ]
    src = str(stream_dir / "src")
    _write_file(spark, rows, src)
    dim = spark.createDataFrame(
        [(100, "gold"), (200, "silver")], ["user_id", "tier"]
    )
    stream = read_event_stream(spark, src, SCHEMA)
    out = enrich_with_static(stream, dim, "user_id")
    run_available_now(out, "enriched", "append", str(stream_dir / "ckpt_enrich"))
    got = {
        (r.event_id, r.tier) for r in spark.sql("SELECT * FROM enriched").collect()
    }
    assert got == {(1, "gold"), (2, "silver"), (3, None)}


def test_foreach_batch_upsert_builds_snapshot_incrementally(spark, stream_dir):
    from dend_spark_data_lake_spark.streaming.windows import foreach_batch_upsert

    src = str(stream_dir / "upsert_src")
    # Batch-ish file 1: keys 100, 200. File 2: update 200 (later ts), insert 300.
    _write_single_file(
        spark,
        [(1, _ts(9), 100, 1.0), (2, _ts(9, 30), 200, 2.0)],
        src + "/f1.parquet",
    )
    _write_single_file(
        spark,
        [(3, _ts(10), 200, 20.0), (4, _ts(10, 5), 300, 3.0)],
        src + "/f2.parquet",
    )
    stream = read_event_stream(spark, src, SCHEMA, max_files_per_trigger=1)
    snap = str(stream_dir / "snapshot")
    foreach_batch_upsert(
        stream,
        snap,
        keys=["user_id"],
        checkpoint_dir=str(stream_dir / "ckpt_upsert"),
        spark=spark,
        tie_break=("event_id",),
    )
    got = {r.user_id: r.value for r in spark.read.parquet(snap).collect()}
    assert got == {100: 1.0, 200: 20.0, 300: 3.0}


@pytest.mark.nightly  # heavyweight replay: default tier must fit the driver's verify budget (r15)
def test_sliding_stream_equals_batch(spark, stream_dir):
    from dend_spark_data_lake_spark.streaming.windows import sliding_agg

    rows = [
        (1, _ts(9, 10), 100, 1.0),
        (2, _ts(9, 40), 100, 2.0),
        (3, _ts(10, 5), 200, 3.0),
    ]
    src = str(stream_dir / "slide_src")
    _write_file(spark, rows, src)
    stream = read_event_stream(spark, src, SCHEMA)
    out = sliding_agg(stream, window="1 hour", slide="30 minutes")
    # update mode: availableNow ends before the 2h watermark would close
    # any window, so append-mode output would be empty by design
    run_available_now(out, "slid", "update", str(stream_dir / "ckpt_slide"))
    got = {
        (r.w_start.isoformat(), r.n_events)
        for r in spark.sql("SELECT * FROM slid").collect()
    }
    # batch twin: same input through the same operator without readStream
    batch = sliding_agg(spark.createDataFrame(rows, SCHEMA),
                        window="1 hour", slide="30 minutes")
    want = {
        (r.w_start.isoformat(), r.n_events) for r in batch.collect()
    }
    assert got == want and len(got) >= 4


def test_sessionize_with_timeout_evicts_via_event_time_timer(spark, stream_dir):
    from dend_spark_data_lake_spark.streaming.stateful import sessionize_with_timeout

    src = str(stream_dir / "sess_src")
    # batch 1: two events 10 min apart (one session for user 100)
    _write_single_file(
        spark,
        [(1, _ts(9, 0), 100, 1.0), (2, _ts(9, 10), 100, 1.0)],
        src + "/f1.parquet",
    )
    # batch 2: a much later event — advances the watermark far past the
    # first session's gap, so its event-time timer must fire and emit it
    _write_single_file(spark, [(3, _ts(13, 0), 100, 1.0)], src + "/f2.parquet")

    stream = read_event_stream(spark, src, SCHEMA, max_files_per_trigger=1)
    out = sessionize_with_timeout(stream, gap_minutes=30)
    run_available_now(out, "sessions", "append", str(stream_dir / "ckpt_sess"))
    got = [
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM sessions").collect()
    ]
    # the 9:00-9:10 session was closed by the timer; the 13:00 session is
    # still open (stream ended before its timer) and must NOT be emitted
    assert got == [(100, _ts(9, 0), _ts(9, 10), 2)]


@pytest.mark.nightly  # heavyweight replay: default tier must fit the driver's verify budget (r15)
def test_stream_stream_interval_join_equals_batch_join(spark, stream_dir):
    """Views joined to clicks within 1h: the stream-stream interval join
    must produce exactly the rows of the equivalent batch join."""
    from dend_spark_data_lake_spark.streaming.windows import (
        stream_stream_interval_join,
    )

    views = [
        (1, _ts(9, 0), 100, 1.0),
        (2, _ts(10, 0), 100, 2.0),
        (3, _ts(9, 30), 200, 3.0),
        (4, _ts(12, 0), 300, 4.0),
    ]
    clicks = [
        (11, _ts(9, 20), 100, 9.0),   # matches view 1 (within 1h)
        (12, _ts(10, 30), 100, 8.0),  # matches view 2 only (1.5h after v1)
        (13, _ts(11, 0), 200, 7.0),   # 1.5h after view 3 -> no match
        (14, _ts(11, 59), 300, 6.0),  # BEFORE view 4 -> no match
    ]
    _write_single_file(spark, views, str(stream_dir / "views" / "v.parquet"))
    _write_single_file(spark, clicks, str(stream_dir / "clicks" / "c.parquet"))

    vs = read_event_stream(spark, str(stream_dir / "views"), SCHEMA)
    cs = read_event_stream(spark, str(stream_dir / "clicks"), SCHEMA)
    joined = stream_stream_interval_join(
        vs, cs, key="user_id", watermark="4 hours", within="1 hour"
    )
    run_available_now(joined, "ssj", "append", str(stream_dir / "ck_ssj"))
    got = {
        (r["event_id"], r["r_event_id"])
        for r in spark.sql("SELECT * FROM ssj").collect()
    }

    bv = spark.createDataFrame(views, SCHEMA)
    bc = spark.createDataFrame(clicks, SCHEMA)
    cond = (
        (bv.user_id == bc.user_id)
        & (bc.ts >= bv.ts)
        & (bc.ts <= bv.ts + F.expr("INTERVAL 1 hour"))
    )
    expected = {
        (r[0], r[1])
        for r in bv.join(bc, cond).select(bv.event_id, bc.event_id).collect()
    }
    assert got == expected == {(1, 11), (2, 12)}


def test_transform_with_state_totals_across_batches(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 arbitrary-state API) must keep
    per-key ValueState across microbatches — final totals equal the batch
    groupBy over ALL input, matching the applyInPandasWithState twin.

    The TWS driver worker speaks protobuf to the JVM; skip where the
    Python ``protobuf`` package is absent (this container).
    """
    pytest.importorskip("google.protobuf")
    from dend_spark_data_lake_spark.streaming.stateful import running_user_totals_tws

    src = str(tmp_path / "src")
    _write_single_file(
        spark,
        [(1, _ts(9), 1, 10.0), (2, _ts(9, 5), 2, 5.0)],
        src + "/a.parquet",
    )
    _write_single_file(
        spark,
        [(3, _ts(10), 1, 7.5), (4, _ts(10, 5), 1, 2.5), (5, _ts(10, 10), 2, 1.0)],
        src + "/b.parquet",
    )
    stream = read_event_stream(spark, src, SCHEMA, max_files_per_trigger=1)
    out = running_user_totals_tws(stream.select("user_id", "value"))
    run_available_now(out, "tws_totals", "update", str(tmp_path / "ck"))
    rows = spark.sql(
        """SELECT user_id, max_by(total_value, n_events) AS total_value,
                  max(n_events) AS n_events
           FROM tws_totals GROUP BY user_id"""
    ).collect()
    got = {r.user_id: (r.n_events, r.total_value) for r in rows}
    assert got == {1: (3, 20.0), 2: (2, 6.0)}


def test_statestore_reader_exposes_window_state(spark, tmp_path):
    """The statestore batch source must expose the tumbling aggregation's
    per-window state (count/sum) from the checkpoint — matching what the
    stream emitted."""
    from dend_spark_data_lake_spark.streaming.windows import (
        read_event_stream,
        read_query_state,
        run_available_now,
        tumbling_agg,
    )

    rows = [
        (1, _ts(10, 5), 1, 10.0),
        (2, _ts(10, 55), 2, 5.0),
        (3, _ts(11, 10), 1, 2.5),
    ]
    src = str(tmp_path / "src")
    _write_file(spark, rows, src)
    ck = str(tmp_path / "ck")
    stream = read_event_stream(spark, src, SCHEMA)
    run_available_now(tumbling_agg(stream), "ss_out", "update", ck)

    state = read_query_state(spark, ck).select(
        F.col("key.window.start").alias("w"),
        F.col("value.count").alias("n"),
        F.col("value.sum").alias("s"),
    )
    got = {(r.w, r.n, r.s) for r in state.collect()}
    assert got == {(_ts(10), 2, 15.0), (_ts(11), 1, 2.5)}


def test_streaming_sessionize_equals_batch_gaps(spark, tmp_path):
    """The custom stateful sessionizer (applyInPandasWithState, event-time
    timers) must produce EXACTLY the sessions the batch lag+cumsum
    formulation finds on the same input — the two implementations of the
    30-minute-gap semantics may never drift apart."""
    from pyspark.sql import Window
    from dend_spark_data_lake_spark.streaming.stateful import (
        sessionize_with_timeout,
    )
    from dend_spark_data_lake_spark.streaming.windows import (
        read_event_stream,
        run_available_now,
    )

    rows = [
        (1, _ts(9, 0), 1, 1.0),
        (2, _ts(9, 10), 1, 1.0),   # same session
        (3, _ts(10, 30), 1, 1.0),  # new session (gap 80m)
        (4, _ts(9, 5), 2, 1.0),
        (5, _ts(9, 50), 2, 1.0),   # new session (gap 45m)
    ]
    import time

    src = tmp_path / "src"
    _write_single_file(spark, rows, str(src / "f1.parquet"))
    time.sleep(1.05)  # file source orders batches by modification time
    # sentinel batch: a far-future event for an EXCLUDED user pushes the
    # watermark past every open session's (end + gap) so the event-time
    # timers fire and append mode emits the final sessions — without it
    # the last session per user is correctly still OPEN (kept in state)
    _write_single_file(spark, [(99, _ts(23, 0), 99, 1.0)], str(src / "f2.parquet"))
    stream = read_event_stream(
        spark, str(src), SCHEMA, max_files_per_trigger=1
    )
    out = sessionize_with_timeout(stream, gap_minutes=30)
    run_available_now(out, "sess_state", "append", str(tmp_path / "ck"))
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.table("sess_state").collect()
        if r.user_id != 99
    }

    # batch twin: lag gap flags + running sum session ids
    batch = spark.read.schema(SCHEMA).parquet(str(src)).filter("user_id != 99")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    s = batch.withColumn(
        "new_s",
        F.when(F.lag("ts").over(w).isNull() | (gap_us > 1_800_000_000), 1)
        .otherwise(0),
    ).withColumn(
        "sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in s.groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .collect()
    }
    assert got == want


@pytest.mark.nightly  # heavyweight replay: default tier must fit the driver's verify budget (r15)
def test_stream_stream_left_outer_join_emits_null_padded_rows(spark, tmp_path):
    """LEFT OUTER stream-stream join: unmatched left rows must surface
    NULL-padded once the watermark passes their join window — the outer
    variant's distinct contract (state eviction DOUBLES as emission).
    Matched pairs must equal the inner join's; unmatched views 3 and 4
    (no click within 1h) emit exactly once with NULL right columns after
    the sentinel batch advances the watermark."""
    import time

    from dend_spark_data_lake_spark.streaming.windows import (
        read_event_stream,
        run_available_now,
        stream_stream_interval_join,
    )

    views = [
        (1, _ts(9, 0), 100, 1.0),
        (2, _ts(10, 0), 100, 2.0),
        (3, _ts(9, 30), 200, 3.0),
        (4, _ts(12, 0), 300, 4.0),
    ]
    clicks = [
        (11, _ts(9, 20), 100, 9.0),   # matches view 1
        (12, _ts(10, 30), 100, 8.0),  # matches view 2
        (13, _ts(11, 0), 200, 7.0),   # 1.5h after view 3 -> no match
        (14, _ts(11, 59), 300, 6.0),  # BEFORE view 4 -> no match
    ]
    _write_single_file(spark, views, str(tmp_path / "views" / "v1.parquet"))
    _write_single_file(spark, clicks, str(tmp_path / "clicks" / "c1.parquet"))
    time.sleep(1.05)  # file source orders batches by modification time
    # sentinel batch on BOTH sides: pushes each side's watermark past
    # every view's [ts, ts+1h] window so unmatched views evict-and-emit
    _write_single_file(
        spark, [(98, _ts(23, 0), 99, 0.0)], str(tmp_path / "views" / "v2.parquet")
    )
    _write_single_file(
        spark, [(99, _ts(23, 0), 99, 0.0)], str(tmp_path / "clicks" / "c2.parquet")
    )

    vs = read_event_stream(
        spark, str(tmp_path / "views"), SCHEMA, max_files_per_trigger=1
    )
    cs = read_event_stream(
        spark, str(tmp_path / "clicks"), SCHEMA, max_files_per_trigger=1
    )
    joined = stream_stream_interval_join(
        vs, cs, key="user_id", watermark="1 minute", within="1 hour",
        how="leftOuter",
    )
    run_available_now(joined, "ssj_outer", "append", str(tmp_path / "ck"))
    got = {
        (r["event_id"], r["r_event_id"])
        for r in spark.sql("SELECT * FROM ssj_outer").collect()
        if r["user_id"] != 99
    }
    assert got == {(1, 11), (2, 12), (3, None), (4, None)}


@pytest.mark.nightly  # heavyweight replay: default tier must fit the driver's verify budget (r15)
def test_watermark_drops_late_rows_and_reports_them(spark, tmp_path):
    """Late-data governance must be OBSERVABLE: a row older than the
    watermark is dropped from the aggregation AND surfaces in the
    query's stateOperators metrics (numRowsDroppedByWatermark) — the
    counter an operations dashboard alerts on. The sentinel at 23:00
    advances the watermark to 22:59 (delay 1 minute); the next batch's
    9:05 event is hours below it and must not change any window.

    Deliberately uses the DEFAULT trigger with phased
    processAllAvailable, not Trigger.AvailableNow: in this Spark build
    the availableNow multi-batch drain does NOT apply the advancing
    watermark to late-row filtering within one drain (verified
    empirically — late rows merge and dropped-counts stay 0), so a
    continuously-running query is both the realistic deployment and the
    only shape where the drop contract is enforceable per batch."""
    from dend_spark_data_lake_spark.streaming.windows import (
        read_event_stream,
        tumbling_agg,
    )

    src = tmp_path / "src"
    _write_single_file(spark, [(1, _ts(9, 0), 1, 1.0)], str(src / "f1.parquet"))
    stream = read_event_stream(spark, str(src), SCHEMA, max_files_per_trigger=1)
    out = tumbling_agg(stream, window="1 hour", watermark="1 minute")
    q = (
        out.writeStream.format("memory")
        .queryName("wm_drops")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()  # batch: event 1 (9:00) — watermark still 0
        _write_single_file(
            spark, [(2, _ts(23, 0), 1, 1.0)], str(src / "f2.parquet")
        )
        q.processAllAvailable()  # sentinel advances watermark to 22:59
        _write_single_file(
            spark, [(3, _ts(9, 5), 1, 1.0)], str(src / "f3.parquet")
        )
        q.processAllAvailable()  # late row: below watermark -> dropped
        dropped = sum(
            op.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for op in (p["stateOperators"] or [])
        )
        got = {
            (r.w_start, r.n_events)
            for r in spark.sql("SELECT * FROM wm_drops").collect()
        }
    finally:
        q.stop()
    assert dropped == 1
    # the 9:00 window holds ONLY event 1 — the late event never landed
    assert (_ts(9, 0), 1) in got
    assert (_ts(9, 0), 2) not in got


@pytest.mark.nightly  # heavyweight replay: default tier must fit the driver's verify budget (r15)
def test_sessionizer_identical_under_rocksdb_state_store(spark, tmp_path):
    """State-store portability: the stateful sessionizer must produce
    byte-identical sessions under the RocksDB provider — the provider a
    real deployment uses once per-executor state outgrows the JVM heap
    (HDFS-backed in-memory maps hold state on-heap; RocksDB spills to
    local disk with the same exactly-once checkpoint contract). Locks
    that the engine's stateful operators carry no hidden dependency on
    the default provider's semantics."""
    import time

    from dend_spark_data_lake_spark.streaming.stateful import (
        sessionize_with_timeout,
    )
    from dend_spark_data_lake_spark.streaming.windows import (
        read_event_stream,
        run_available_now,
    )

    rows = [
        (1, _ts(9, 0), 1, 1.0),
        (2, _ts(9, 10), 1, 1.0),   # same session
        (3, _ts(10, 30), 1, 1.0),  # new session (gap 80m)
        (4, _ts(9, 5), 2, 1.0),
    ]
    src = tmp_path / "src"
    _write_single_file(spark, rows, str(src / "f1.parquet"))
    time.sleep(1.05)
    _write_single_file(spark, [(99, _ts(23, 0), 99, 1.0)], str(src / "f2.parquet"))

    key = "spark.sql.streaming.stateStore.providerClass"
    try:
        saved = spark.conf.get(key)
    except Exception:
        saved = None
    try:
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        stream = read_event_stream(
            spark, str(src), SCHEMA, max_files_per_trigger=1
        )
        out = sessionize_with_timeout(stream, gap_minutes=30)
        run_available_now(out, "sess_rocks", "append", str(tmp_path / "ck"))
    finally:
        if saved is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, saved)
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.table("sess_rocks").collect()
        if r.user_id != 99
    }
    # sentinel closes every session: both user-1 sessions and user-2's
    assert got == {
        (1, _ts(9, 0), _ts(9, 10), 2),
        (1, _ts(10, 30), _ts(10, 30), 1),
        (2, _ts(9, 5), _ts(9, 5), 1),
    }
