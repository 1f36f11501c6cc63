"""spark-submit-able corpus-preparation job: the production face of the
LLM-data-pipeline composites.

Runs the full-corpus preparation (``pipeline_llm_corpus``: quality gate →
near-dup clustering → split accounting) and, optionally, the steady-state
ingest cycle (``pipeline_incremental_ingest``: batch quality gate →
incremental near-dup vs corpus → greedy packing) and the eval-safe
curation cycle (``pipeline_curation``: quality gate → decontamination →
fingerprint dedup → temperature resampling → k-fold accounting) over a
directory of the standard parquet tables, writing each result as parquet
under ``--output``.

One artifact runs identically under YARN / Kubernetes / standalone / local —
the session defers the master choice to spark-submit (same posture as
``jobs/sparkify_etl_job.py``):

    spark-submit --master yarn --deploy-mode cluster \\
        --py-files dend_spark_data_lake_spark.zip \\
        jobs/corpus_prep_job.py \\
        --data s3a://<bucket>/tables --output s3a://<bucket>/corpus_prep

Local smoke run:

    python jobs/corpus_prep_job.py --master 'local[4]' \\
        --data /root/testdata/sf0.001 --output /tmp/corpus_out
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dend_spark_data_lake_spark import queries as Q  # noqa: E402
from dend_spark_data_lake_spark.session import get_spark  # noqa: E402

STAGES = ("pipeline_llm_corpus", "pipeline_incremental_ingest", "pipeline_curation")


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="LLM corpus preparation job")
    p.add_argument("--data", required=True, help="directory of input parquet tables")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument(
        "--stages",
        default=",".join(STAGES),
        help=f"comma-separated subset of {STAGES} to run",
    )
    p.add_argument(
        "--master",
        default="",
        help="Spark master for LOCAL runs; leave unset under spark-submit",
    )
    p.add_argument(
        "--shards",
        action="store_true",
        help=(
            "additionally publish each stage as JSONL training shards via "
            "the 'jsonlshards' Python data-source sink (atomic _SUCCESS "
            "manifest; the format LLM training loaders consume)"
        ),
    )
    return p.parse_args(argv)


def main(argv: list[str] | None = None) -> None:
    args = parse_args(argv)
    stages = [s.strip() for s in args.stages.split(",") if s.strip()]
    unknown = [s for s in stages if s not in STAGES]
    if unknown:
        raise SystemExit(f"unknown stages {unknown}; choose from {STAGES}")
    spark = get_spark(app_name="corpus-prep", master=args.master)
    if args.shards:
        from dend_spark_data_lake_spark.sources.pydatasource import register

        register(spark)
    for stage in stages:
        df = Q.REGISTRY[stage].fn(spark, args.data)
        dest = os.path.join(args.output, stage)
        df.write.mode("overwrite").parquet(dest)
        print(f"{stage}: {spark.read.parquet(dest).count()} rows -> {dest}")
        if args.shards:
            sdest = os.path.join(args.output, stage + "_shards")
            df.write.format("jsonlshards").option("path", sdest).mode(
                "overwrite"
            ).save()
            print(f"{stage}: JSONL shards -> {sdest}")


if __name__ == "__main__":
    main()
