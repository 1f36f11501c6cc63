"""Sources and sinks.

Generalizes the reference's I/O surface (SURVEY.md §2.1 S1-S4):

- S1 JSON-lines scan with glob — but with *explicit* schemas at scale
  (the reference infers at ``etl_pipeline.py:110,238``; inference is a
  full-data pass, unacceptable at 100 TB).
- S2 Parquet scan.
- S3/S4 Parquet sinks, unpartitioned and Hive-partitioned, with explicit
  write mode (reference defect D4: default ``errorifexists`` crashes reruns).

Plus the driver-testdata loader, including the ``events`` table whose parquet
files carry TIMESTAMP(NANOS) — unreadable by vanilla Spark 4; we read nanos
as long (``spark.sql.legacy.parquet.nanosAsLong``) and convert with *integer*
division (``DIV 1000``) so no precision is lost (a double-precision division
of epoch-nanos loses ~hundreds of ns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-testdata table as a DataFrame with clean types."""
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events":
        # `ts` arrives either as parquet TIMESTAMP(NANOS) (surfaced as a
        # nanos long under the legacy conf — truncate to micros, matching
        # DuckDB's microsecond TIMESTAMP) or as a plain micros TIMESTAMP_NTZ
        # (cast to session-TZ timestamp; session TZ is pinned UTC so values
        # are preserved). Branch on the physical type so both generations of
        # the driver testdata read identically.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if df.schema["ts"].dataType.simpleString() == "bigint":
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, names=TESTDATA_TABLES) -> dict[str, DataFrame]:
    return {n: read_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=TESTDATA_TABLES) -> None:
    """Register each table as a temp view for the SQL surface."""
    for n in names:
        read_table(spark, sf_dir, n).createOrReplaceTempView(n)


def read_json_lines(spark: SparkSession, path: str, schema=None, multiline: bool = False) -> DataFrame:
    """JSON-lines scan (reference S1, ``etl_pipeline.py:110,238``).

    ``schema`` should be a StructType (or DDL string) in production; pass
    None only in exploration — inference scans the whole input once.
    PERMISSIVE mode keeps malformed rows in ``_corrupt_record`` instead of
    failing the 100-TB job on one bad line.
    """
    reader = spark.read.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    )
    if multiline:
        reader = reader.option("multiLine", "true")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Parquet sink (reference S3/S4, ``etl_pipeline.py:113-118,242-247,287-289``).

    Explicit mode (defect D4); optional partitioning mirrors the reference's
    ``partitionBy("year","artist_id")`` / ``("year","month")`` layouts, which
    buy reader-side partition pruning for free. ``max_records_per_file``
    bounds output file size at scale (small-files vs giant-files control).
    """
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_csv(
    spark: SparkSession, path: str, schema=None, header: bool = True, sep: str = ","
) -> DataFrame:
    """CSV scan with the same schema posture as JSON: explicit StructType in
    production (inference reads the data twice), PERMISSIVE bad-row capture."""
    reader = (
        spark.read.option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_orc(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """ORC scan — second columnar lake format next to Parquet. Same posture:
    explicit schema in production; ORC gets the same Catalyst pushdown /
    pruning treatment as Parquet (predicate pushdown into stripes via
    min/max + bloom filters when present)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink with explicit mode and optional Hive partitioning — mirrors
    write_parquet so a lake can be dual-format."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_text_lines(spark: SparkSession, path: str, whole_file: bool = False) -> DataFrame:
    """Plain-text source: one row per line (column ``value``), or one row
    per file with ``whole_file`` — the raw-corpus ingest path for text
    pipelines (each file splits into per-line partitions; wholetext files
    are indivisible, so keep them small or chunk downstream)."""
    # NB: must be the reader kwarg — the string option("wholetext", ...) is
    # silently ignored by the Spark 4 text source.
    return spark.read.text(path, wholetext=whole_file)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Binary-file source for multimodal ingest (SURVEY.md §2.5): one row
    per file with (path, modificationTime, length, content BINARY). The
    raw on-ramp for image/audio/video payloads feeding
    functions/multimodal.py; ``glob`` filters by pattern (e.g. ``*.png``).
    At scale, prefer many medium files over few huge ones — a wholetext/
    binary file is indivisible, so file size bounds task parallelism."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_xml(spark: SparkSession, path: str, row_tag: str, schema=None) -> DataFrame:
    """XML scan (native in Spark 4 — no spark-xml package needed): one row
    per ``row_tag`` element. Same schema posture as JSON: explicit
    StructType in production, inference only in exploration."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_xml(
    df: DataFrame, path: str, row_tag: str, root_tag: str = "rows", mode: str = "overwrite"
) -> None:
    """XML sink with explicit mode — completes the interchange-format
    matrix (parquet/orc/json/csv/text/xml)."""
    (
        df.write.format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .mode(mode)
        .save(path)
    )


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (bucketBy + saveAsTable — bucketing only
    exists through the catalog, not path-based writes).

    Two tables bucketed by the same key into the same bucket count join
    WITHOUT a shuffle exchange on either side — at 100 TB this converts
    every recurring fact-fact join on the bucket key from the dominant
    shuffle into a local zip of pre-hashed files; sorted buckets also drop
    the sort from sort-merge join.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)
