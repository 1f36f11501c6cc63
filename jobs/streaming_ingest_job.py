"""spark-submit-able STREAMING ingest job: the continuous face of the
corpus pipeline (``jobs/corpus_prep_job.py`` is the batch face).

Reads the registered custom streaming source ("synthdocs" — stands in for
the real feed: a queue, a drop directory, a CDC stream), enriches each
microbatch scan-side (token counts, quality signals, normalized
fingerprint — all JVM expressions from ``functions/text.py``), applies
the quality gate, and appends parquet under ``--output`` with an
exactly-once checkpoint: killing and rerunning the job resumes from the
recorded offset and never duplicates or drops a document (the contract
``tests/test_pydatasource.py::test_stream_reader_resumes_from_checkpoint``
pins at the source level, exercised here end to end as a job).

The default mode drains the backlog and exits (processAllAvailable over
the default trigger — see the note in ``main`` on why not AvailableNow),
which makes the same artifact usable as a cron-driven incremental ingest
or, with ``--continuous``, a long-running service. One artifact runs
identically under YARN / Kubernetes / standalone / local (master deferred
to spark-submit; same posture as the other jobs):

    spark-submit --master yarn --deploy-mode cluster \\
        --py-files dend_spark_data_lake_spark.zip \\
        jobs/streaming_ingest_job.py \\
        --output s3a://<bucket>/ingested --checkpoint s3a://<bucket>/ck

Local smoke run:

    python jobs/streaming_ingest_job.py --master 'local[4]' \\
        --rows 200 --output /tmp/ingest_out --checkpoint /tmp/ingest_ck
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dend_spark_data_lake_spark.functions import text as TX  # noqa: E402
from dend_spark_data_lake_spark.session import get_spark  # noqa: E402
from dend_spark_data_lake_spark.sources.pydatasource import register  # noqa: E402


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="streaming corpus ingest job")
    p.add_argument("--output", required=True, help="parquet output directory")
    p.add_argument("--checkpoint", required=True, help="checkpoint directory")
    p.add_argument("--rows", type=int, default=1000, help="source row cap")
    p.add_argument(
        "--rows-per-batch", type=int, default=100, help="rate limit per microbatch"
    )
    p.add_argument(
        "--min-tokens", type=int, default=4, help="quality gate: minimum tokens"
    )
    p.add_argument(
        "--continuous",
        action="store_true",
        help="run until killed instead of draining the backlog and exiting",
    )
    p.add_argument(
        "--master",
        default="",
        help="Spark master for LOCAL runs; leave unset under spark-submit",
    )
    return p.parse_args(argv)


def enriched_stream(spark, rows: int, rows_per_batch: int, min_tokens: int):
    """The job's logical plan: stream scan -> scan-side enrichment ->
    quality gate. Pure narrow expressions — each microbatch parallelizes
    across executors exactly like the batch read."""
    register(spark)
    docs = (
        spark.readStream.format("synthdocs")
        .option("rows", rows)
        .option("rows_per_batch", rows_per_batch)
        .load()
    )
    return (
        docs.withColumn("n_tokens", TX.token_count_ws("text"))
        .withColumn("fingerprint", TX.normalized_fingerprint("text"))
        .filter(F.col("n_tokens") >= min_tokens)
    )


def main(argv: list[str] | None = None) -> None:
    args = parse_args(argv)
    spark = get_spark(app_name="streaming_ingest", master=args.master or None)
    out = enriched_stream(spark, args.rows, args.rows_per_batch, args.min_tokens)
    q = (
        out.writeStream.format("parquet")
        .option("path", args.output)
        .option("checkpointLocation", args.checkpoint)
        .start()
    )
    if args.continuous:
        q.awaitTermination()
    else:
        # drain-then-exit. NOT Trigger.AvailableNow: that trigger snapshots
        # ONE latestOffset() step as the drain target, so a rate-limited
        # source would stop after a single microbatch; processAllAvailable
        # keeps planning batches until the source reports caught-up, which
        # is the semantics an incremental cron ingest needs.
        q.processAllAvailable()
        q.stop()


if __name__ == "__main__":
    main()
