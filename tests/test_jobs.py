"""The spark-submit job wrapper (jobs/sparkify_etl_job.py) must run the
full pipeline end-to-end from CLI args — the E2 cluster-submission analog
(reference /root/reference/emr_step.json + main.py)."""

from __future__ import annotations

import json

from tests.test_sparkify_golden import LOGS, SONGS


def test_job_main_runs_pipeline(spark, tmp_path):
    import jobs.sparkify_etl_job as job

    song_path, log_path = tmp_path / "song_data.json", tmp_path / "log_data.json"
    song_path.write_text("\n".join(json.dumps(r) for r in SONGS))
    log_path.write_text("\n".join(json.dumps(r) for r in LOGS))
    out = tmp_path / "lake"
    # --master omitted: the active test session is reused via getOrCreate,
    # exactly like running under spark-submit where the master is external
    job.main(
        [
            "--song-path", str(song_path),
            "--log-path", str(log_path),
            "--output", str(out),
        ]
    )
    for table in ("songs", "artists", "users", "time", "songplays"):
        assert (out / table).exists(), table
        assert spark.read.parquet(str(out / table)).count() > 0, table


def test_corpus_prep_job_writes_all_stages(spark, tmp_path):
    import jobs.corpus_prep_job as job

    out = tmp_path / "corpus"
    job.main(["--data", "/root/testdata/sf0.001", "--output", str(out)])
    for stage in (
        "pipeline_llm_corpus",
        "pipeline_incremental_ingest",
        "pipeline_curation",
    ):
        df = spark.read.parquet(str(out / stage))
        assert df.count() > 0, stage


def test_corpus_prep_job_rejects_unknown_stage(tmp_path):
    import pytest

    import jobs.corpus_prep_job as job

    with pytest.raises(SystemExit):
        job.main(
            ["--data", "x", "--output", str(tmp_path), "--stages", "nope"]
        )


def test_corpus_prep_job_publishes_jsonl_shards(spark, tmp_path):
    """--shards additionally publishes each stage through the jsonlshards
    sink with its atomic _SUCCESS manifest."""
    import json
    import os

    import jobs.corpus_prep_job as job

    out = tmp_path / "corpus_sh"
    job.main(
        [
            "--data", "/root/testdata/sf0.001",
            "--output", str(out),
            "--stages", "pipeline_curation",
            "--shards",
        ]
    )
    sdir = out / "pipeline_curation_shards"
    manifest = json.load(open(sdir / "_SUCCESS"))
    n_manifest = sum(s["rows"] for s in manifest["shards"])
    n_parquet = spark.read.parquet(str(out / "pipeline_curation")).count()
    assert n_manifest == n_parquet > 0
    assert spark.read.json(os.path.join(str(sdir), "shard-*.jsonl")).count() == n_parquet


def test_streaming_ingest_job_drains_and_resumes(spark, tmp_path):
    """The streaming ingest job must drain the capped source exactly once
    (quality gate applied) and, rerun with a HIGHER cap on the same
    checkpoint, append only the undelivered tail — the job-level
    exactly-once contract a cron-driven incremental ingest relies on."""
    from jobs.streaming_ingest_job import main as ingest_main

    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def run(rows):
        ingest_main(
            [
                "--output", out,
                "--checkpoint", ck,
                "--rows", str(rows),
                "--rows-per-batch", "40",
                "--master", "local[2]",
            ]
        )

    run(100)
    first = spark.read.parquet(out)
    assert first.count() == 100  # 8-token docs all pass the gate
    assert set(first.columns) == {
        "doc_id", "lang", "text", "n_tokens", "fingerprint"
    }
    run(150)
    merged = spark.read.parquet(out)
    assert sorted(r.doc_id for r in merged.collect()) == list(range(150))
