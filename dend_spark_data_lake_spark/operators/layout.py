"""Physical lake layout: z-order clustering keys and small-file compaction.

Parquet data skipping works off per-file/row-group min-max ranges; sorting
by one column gives perfect skipping on that column and none on others.
Interleaving the bits of two normalized sort keys — a Morton / z-order
curve — gives each key partial locality, so range predicates on EITHER
column prune most files. Delta/Iceberg expose this as ``OPTIMIZE ZORDER
BY``; on plain Parquet it is just "sort by the interleaved key before
writing", which is what this module provides. The bit-twiddling unrolls
into shift/AND/OR column expressions at plan-build time — one
whole-stage-codegen projection, no UDF.

Compaction is the other half of layout hygiene: streaming/incremental
writers produce many small files; rewriting a directory into
``ceil(bytes / target)`` files restores scan efficiency (fewer tasks,
bigger sequential reads, better row-group stats).

Reference parity: the reference writes Hive-partitioned parquet once
(``etl_pipeline.py:113-115,245-247,287-289``) and never revisits layout;
both operators here are driver-mandated 100-TB posture (SURVEY.md §4.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _normalize_to_bits(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column onto [0, 2^bits) by min-max scaling (rank-based
    scaling resists skew better but costs a window pass; min-max is the
    one-aggregate default)."""
    span = hi - lo if hi > lo else 1.0
    unit = (col.cast("double") - F.lit(lo)) / F.lit(span)
    max_code = 2**bits - 1
    return F.least(
        F.lit(max_code).cast("long"),
        F.greatest(
            F.lit(0).cast("long"), F.round(unit * max_code).cast("long")
        ),
    )


def morton_key(xc: Column, yc: Column, bits: int = 16) -> Column:
    """Interleave the ``bits`` low bits of two integer codes: bit i of x
    lands at position 2i, bit i of y at 2i+1. Unrolled into 2*bits
    shift/AND/OR expressions inside one codegen'd projection."""
    out = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    for i in range(bits):
        xbit = F.shiftright(xc, i).bitwiseAND(one)
        ybit = F.shiftright(yc, i).bitwiseAND(one)
        out = out.bitwiseOR(F.shiftleft(xbit, 2 * i)).bitwiseOR(
            F.shiftleft(ybit, 2 * i + 1)
        )
    return out


def add_zorder_key(
    df: DataFrame, x: str, y: str, bits: int = 16, out: str = "zkey"
) -> DataFrame:
    """Add a z-order sort key interleaving min-max-normalized ``x`` and
    ``y``. ``repartitionByRange(out).sortWithinPartitions(out)`` before a
    write clusters files so range predicates on either source column skip
    most files. One stats aggregate + one projection; the collect is 4
    scalars, not data."""
    stats = df.agg(
        F.min(F.col(x).cast("double")).alias("xlo"),
        F.max(F.col(x).cast("double")).alias("xhi"),
        F.min(F.col(y).cast("double")).alias("ylo"),
        F.max(F.col(y).cast("double")).alias("yhi"),
    ).collect()[0]
    xc = _normalize_to_bits(F.col(x), stats.xlo, stats.xhi, bits)
    yc = _normalize_to_bits(F.col(y), stats.ylo, stats.yhi, bits)
    return df.withColumn(out, morton_key(xc, yc, bits))


def write_zordered(
    df: DataFrame, path: str, x: str, y: str, n_files: int, bits: int = 16
) -> None:
    """Write ``df`` as parquet clustered on the z-order of (x, y):
    range-partition by the Morton key (so files own contiguous curve
    segments), sort within partitions (so row groups within a file stay
    tight), drop the helper key on the way out."""
    keyed = add_zorder_key(df, x, y, bits)
    (
        keyed.repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet_dir(
    spark, path: str, target_file_mb: int = 128, sort_within_by: list[str] | None = None
) -> int:
    """Rewrite a parquet directory into ~target-sized files; returns the new
    file count. ``sort_within_by`` re-sorts rows inside each output file so
    row-group min-max stats stay tight after compaction. Writes via a temp
    dir + swap (the plan reads the path it replaces).

    The swap is crash-safe: the old directory is renamed ASIDE first, the
    new one moved in, and the old copy deleted LAST — a failure at any
    point leaves either the original or the compacted data at ``path``,
    never neither. The temp dir is always cleaned up."""
    import glob
    import os
    import shutil
    import tempfile

    df = spark.read.parquet(path)
    total_bytes = sum(
        os.path.getsize(f) for f in glob.glob(path + "/**/*.parquet", recursive=True)
    )
    n_files = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
    out = df.repartition(n_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    tmp = tempfile.mkdtemp(prefix="compact_")
    old = path.rstrip("/") + ".compact_old"
    try:
        out.write.mode("overwrite").parquet(tmp + "/snap")
        os.rename(path, old)  # same-filesystem atomic move aside
        try:
            shutil.move(tmp + "/snap", path)
        except BaseException:
            os.rename(old, path)  # roll the original back in
            raise
        shutil.rmtree(old)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return len(glob.glob(path + "/*.parquet"))


def morton_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """DuckDB rendering of :func:`morton_key` over integer SQL expressions
    — generated from the same bit loop so the two interleaves cannot
    drift. Pure shift/AND/OR integer arithmetic: bit-exact cross-engine."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x_expr} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y_expr} >> {i}) & 1) << {2 * i + 1})")
    return "CAST((" + " | ".join(terms) + ") AS BIGINT)"
