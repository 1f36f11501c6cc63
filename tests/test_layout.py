"""Layout operators: Morton key correctness vs a Python reference, z-order
write actually improves two-column file skipping, compaction hits the
target file count."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from dend_spark_data_lake_spark.operators.layout import (
    add_zorder_key,
    compact_parquet_dir,
    morton_key,
    write_zordered,
)


def _py_morton(x: int, y: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_morton_key_matches_python_reference(spark):
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x",
            "y",
            morton_key(F.col("x").cast("long"), F.col("y").cast("long"), 3).alias("z"),
        ).collect()
    }
    assert got == {(x, y): _py_morton(x, y, 3) for x, y in rows}


def _files_containing(path, col, lo, hi):
    """Count parquet files whose [min,max] range for col intersects [lo,hi]
    — a reader's file-skipping decision, taken from real footer stats."""
    n = 0
    for f in sorted(glob.glob(path + "/*.parquet")):
        md = pq.ParquetFile(f).metadata
        fmin = min(
            md.row_group(i).column(
                [md.schema.column(j).name for j in range(md.num_columns)].index(col)
            ).statistics.min
            for i in range(md.num_row_groups)
        )
        fmax = max(
            md.row_group(i).column(
                [md.schema.column(j).name for j in range(md.num_columns)].index(col)
            ).statistics.max
            for i in range(md.num_row_groups)
        )
        if fmin <= hi and fmax >= lo:
            n += 1
    return n


def test_zorder_write_skips_files_on_both_columns(spark, tmp_path):
    n = 64 * 64
    grid = spark.range(n).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    n_files = 16

    lin = str(tmp_path / "linear")
    grid.repartitionByRange(n_files, "x").sortWithinPartitions("x").write.parquet(lin)
    zo = str(tmp_path / "zordered")
    write_zordered(grid, zo, "x", "y", n_files=n_files, bits=6)

    # a narrow range on x: the x-sorted layout wins there...
    assert _files_containing(lin, "x", 10, 13) <= 2
    # ...but reads EVERY file for a y-range; z-order must skip files on BOTH
    y_lin = _files_containing(lin, "y", 10, 13)
    y_zo = _files_containing(zo, "y", 10, 13)
    x_zo = _files_containing(zo, "x", 10, 13)
    assert y_lin == n_files  # linear layout cannot skip on y
    assert y_zo <= n_files // 2, y_zo
    assert x_zo <= n_files // 2, x_zo


def test_compact_parquet_dir_reduces_file_count(spark, tmp_path):
    path = str(tmp_path / "frag")
    spark.range(10000).repartition(40).write.parquet(path)
    assert len(glob.glob(path + "/*.parquet")) == 40
    n = compact_parquet_dir(spark, path, target_file_mb=1)
    assert n <= 2
    assert spark.read.parquet(path).count() == 10000
