"""Structured Streaming operators over event streams (SURVEY.md §2.5).

Streaming twins of the batch window queries in ``queries.py``
(window_tumbling / window_sliding / session_window_batch), plus streaming
dedup. The batch twins are the oracle-checkable faces of these operators;
the tests assert stream == batch on the same input.

Scale posture: watermarks bound state (late rows beyond the delay are
dropped, closed windows are evicted); ``dropDuplicatesWithinWatermark``
keeps only in-horizon keys; all aggregations here are keyed so state
partitions across executors by group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_event_stream(
    spark: SparkSession,
    path: str,
    schema,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based stream source with an explicit schema (streaming sources
    never infer). ``max_files_per_trigger`` shapes microbatches — one file
    per batch lets tests exercise watermark advancement."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.format(fmt).load(path)


def tumbling_agg(
    events: DataFrame, ts_col: str = "ts", window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window count/sum with late-data drop beyond the watermark."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("w_start"), "n_events", "total_value")
    )


def sliding_agg(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window aggregate; each event lands in window/slide buckets."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("w_start"), "n_events")
    )


def session_agg(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    key: str = "user_id",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows with an inactivity gap, per key — the native
    ``session_window`` operator (state merges adjacent sessions)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(key),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_stream(
    events: DataFrame, keys: list[str], ts_col: str = "ts", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact dedup: drops key repeats arriving within the
    watermark horizon; state for a key is evicted once the watermark
    passes, so memory stays bounded (unlike unbounded dropDuplicates)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def enrich_with_static(
    events: DataFrame, dim: DataFrame, on: list[str] | str, how: str = "left"
) -> DataFrame:
    """Stream-static join: enrich each microbatch with a (batch) dimension
    table. The static side is re-planned per microbatch, so a broadcast
    hint keeps every batch a map-side hash join — no streaming state at
    all (unlike stream-stream joins, which buffer both sides)."""
    return events.join(F.broadcast(dim), on, how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "2 hours",
    within: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join bounded by an event-time interval: pair each
    left event with right events for the same key whose timestamp falls in
    ``[left_ts, left_ts + within]`` — e.g. attribute a click to the view it
    followed. Right-side columns come back prefixed ``r_``.

    Both sides carry watermarks and the join condition bounds the two event
    times against each other, which is what lets Spark EVICT buffered rows:
    a right row older than (watermark) can never match a future left row,
    so state stays proportional to the interval x arrival rate, not to the
    stream's history. Without the time bound the state grows forever — the
    classic stream-join scale killer this operator exists to avoid. The
    join itself shuffles both sides by ``key``, same as the batch plan."""
    l = left.withWatermark(left_ts, watermark)
    r = right.select(
        F.col(key).alias("__rk"),
        F.col(right_ts).alias("r_" + right_ts),
        *[
            F.col(c).alias("r_" + c)
            for c in right.columns
            if c not in (key, right_ts)
        ],
    ).withWatermark("r_" + right_ts, watermark)
    rts = F.col("r_" + right_ts)
    cond = (
        (F.col(key) == F.col("__rk"))
        & (rts >= F.col(left_ts))
        & (rts <= F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, how).drop("__rk")


def foreach_batch_upsert(
    events: DataFrame,
    snapshot_path: str,
    keys: list[str],
    checkpoint_dir: str,
    spark: SparkSession,
    ts_col: str = "ts",
    tie_break: tuple[str, ...] = (),
) -> None:
    """Incremental lake maintenance: drain the stream with availableNow,
    applying each microbatch to the Parquet snapshot via MERGE upsert
    (operators/merge.py) inside ``foreachBatch`` — the standard pattern for
    sinks with no native streaming support. Each batch deduplicates on the
    merge keys first (a microbatch can carry several versions of a key; the
    max-ts row wins) so the merge join stays 1:1.

    The rewrite cost is one full-outer join per batch; at scale the
    snapshot would be partitioned and only affected partitions rewritten
    (dynamic partition overwrite), or handed to a MERGE-native format
    (Delta/Iceberg)."""
    from ..operators.dedup import dedup_keep_latest
    from ..operators.merge import merge_upsert

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        import os
        import shutil
        import tempfile

        latest = dedup_keep_latest(batch, keys, ts_col=ts_col, tie_break=tie_break)
        # First-batch detection is an explicit existence check — a bare
        # except here would treat a transient read error or a merge schema
        # mismatch as "first batch" and silently replace the whole snapshot
        # with one microbatch. Real errors must propagate and fail the
        # stream (the checkpoint makes the batch replayable).
        if os.path.exists(snapshot_path):
            target = spark.read.parquet(snapshot_path)
            merged = merge_upsert(target, latest, keys)
        else:
            merged = latest
        # Write via temp dir + swap: the merge plan reads the same path it
        # replaces, so an in-place overwrite would corrupt its own input.
        # Swap order is crash-safe: move the old snapshot ASIDE first (a
        # same-filesystem rename), move the new one in, delete the old copy
        # last — a failure between steps leaves either the old or the new
        # snapshot at the path, never nothing.
        tmp = tempfile.mkdtemp(prefix="merge_snap_")
        try:
            merged.write.mode("overwrite").parquet(tmp + "/snap")
            old = None
            if os.path.exists(snapshot_path):
                old = snapshot_path.rstrip("/") + f".old.{batch_id}"
                os.rename(snapshot_path, old)
            shutil.move(tmp + "/snap", snapshot_path)
            if old is not None:
                shutil.rmtree(old, ignore_errors=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    q = (
        events.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_available_now(
    df: DataFrame, query_name: str, output_mode: str, checkpoint_dir: str
) -> None:
    """Drain all available input into an in-memory table (tests/CI): the
    availableNow trigger processes the backlog in bounded microbatches and
    terminates."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_query_state(spark, checkpoint_dir: str):
    """State-store introspection (Spark 4 ``statestore`` batch source):
    read a streaming query's OPERATOR STATE straight out of its checkpoint
    as a DataFrame — the observability surface for answering "what is this
    stateful query holding, and how big is it" without instrumenting the
    query itself. Pair with the ``state-metadata`` source to discover
    operator/partition layout. Reads are batch and offline: state debugging
    works on a stopped (or crashed) query's checkpoint, which is exactly
    when you need it. At scale the read parallelizes by state partition —
    the same partitioning the running query used."""
    return spark.read.format("statestore").load(checkpoint_dir)
