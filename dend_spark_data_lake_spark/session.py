"""SparkSession bootstrap.

Replaces the reference's singleton wrapper (``/root/reference/spark.py:18-74``)
— which shadows ``pyspark.sql.SparkSession`` and crashes at import (SURVEY.md
§2.4-D1) — with a plain builder. Configuration posture for scale:

- UTC session timezone: timestamp derivations are executor-TZ-independent
  (the reference's ``datetime.fromtimestamp`` UDF at ``etl_pipeline.py:170``
  depends on local TZ; see SURVEY.md §2.4-D3).
- AQE on: runtime shuffle-partition coalescing, skew-join splitting, and
  broadcast promotion — the knobs that matter at 100 TB.
- Arrow on: vectorized JVM<->Python transfer for the few Pandas-UDF operators.
- shuffle.partitions sized from the core count for local runs; a real cluster
  deployment would size this from executor count x cores (AQE coalesces down,
  so err on the high side there).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dend_spark_data_lake_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with the engine's default posture.

    ``master=""`` (empty string) means "do not set a master at all" — the
    spark-submit / cluster-manager choice wins (builder.master would
    override ``spark-submit --master yarn``); ``master=None`` keeps the
    local-mode default derived from SPARK_GRAFT_CPUS.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "").strip()
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else (os.cpu_count() or 8)

    # Python workers do not inherit the driver's sys.path, only PYTHONPATH /
    # their own cwd — a driver script launched from outside the repo (cron
    # job, notebook, /tmp harness) can build plans whose pickled UDFs
    # reference this package by module name and then fail to unpickle on the
    # worker. Exporting the package's parent dir before the JVM starts makes
    # the session location-independent (a real cluster ships the package via
    # --py-files / a wheel instead).
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_parent}{os.pathsep}{existing}" if existing else pkg_parent
        )

    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    # Local mode puts driver + all executor threads in ONE JVM; Spark's
    # 1g default heap is sized for a thin cluster driver, not a 32-core
    # local box, and under-provisions buffer-heavy aggregates (observed:
    # heap exhaustion at sf0.1 under the default). GATED on the caller /
    # cluster not having chosen a size already (spark-submit --driver-memory
    # lands in SparkConf via system properties): driver heap cannot change
    # after JVM launch, so setting it here would be silently stale rather
    # than applied.
    from pyspark import SparkConf

    if not SparkConf().contains("spark.driver.memory"):
        builder = builder.config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
    builder = (
        builder
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # predicate pushdown into custom Python data sources (Spark 4.1;
        # off by default) — sources/pydatasource.py prunes partitions with it
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # Idempotent partitioned re-writes (reference defect D4: default
        # errorifexists mode crashes on rerun, etl_pipeline.py:113-118).
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def configure_for_testdata(spark: SparkSession) -> SparkSession:
    """Runtime confs needed to read the driver testdata on any session.

    The ``events`` table is written with parquet TIMESTAMP(NANOS), which
    Spark rejects by default; reading it as a long and converting with
    integer division preserves exactness (see ``sources.io.read_table``).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark
