"""spark-submit-able Sparkify ETL job — the cluster-submission analog of the
reference deployment (SURVEY.md §2.1 E2).

The reference ships ``main.py`` (hardcoded bucket URIs, singleton session
wrapper; /root/reference/main.py:1-26) submitted as an EMR step
(/root/reference/emr_step.json:1-13: ``--master yarn --deploy-mode cluster``).
This job is the engine's equivalent: same pipeline, parameterized paths, and
a session that DEFERS the master choice to spark-submit so one artifact runs
identically under YARN, Kubernetes, standalone, or local mode:

    spark-submit --master yarn --deploy-mode cluster \
        --py-files dend_spark_data_lake_spark.zip \
        jobs/sparkify_etl_job.py \
        --song-path  s3a://<bucket>/song_data/*/*/*/*.json \
        --log-path   s3a://<bucket>/log_data/*.json \
        --output     s3a://<bucket>/output

(An EMR "step" is exactly this spark-submit arg list; cloud credentials come
from the cluster's instance profile / submit environment, never from code —
the reference's config-file + env-var credential plumbing, spark.py:33-47,
is deliberately NOT reproduced.)

Local smoke run (no cluster):

    python jobs/sparkify_etl_job.py --master 'local[4]' \
        --song-path song_data.json --log-path log_data.json --output out/
"""

from __future__ import annotations

import argparse
import os
import sys

# When submitted as a plain file (not an installed package), the repo root
# rides along via --py-files; for local runs, derive it from this file.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dend_spark_data_lake_spark.plans.sparkify import run_sparkify_pipeline  # noqa: E402
from dend_spark_data_lake_spark.session import get_spark  # noqa: E402


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Sparkify JSON -> star-schema Parquet ETL")
    p.add_argument("--song-path", required=True, help="song_data JSON-lines glob")
    p.add_argument("--log-path", required=True, help="log_data JSON-lines glob")
    p.add_argument("--output", required=True, help="output directory for the 5 tables")
    p.add_argument(
        "--master",
        default="",
        help="Spark master for LOCAL runs (e.g. 'local[4]'). Leave unset "
        "under spark-submit so --master/--deploy-mode win.",
    )
    return p.parse_args(argv)


def main(argv: list[str] | None = None) -> None:
    args = parse_args(argv)
    spark = get_spark(app_name="sparkify-etl", master=args.master)
    tables = run_sparkify_pipeline(spark, args.song_path, args.log_path, args.output)
    for name, df in tables.items():
        print(f"{name}: {df.count()} rows")


if __name__ == "__main__":
    main()
