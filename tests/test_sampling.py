"""Deterministic sampling/splitting unit tests (operators/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from dend_spark_data_lake_spark.operators import sampling as SAMP
from dend_spark_data_lake_spark.sources.io import read_table


def test_threshold_hex_values():
    assert SAMP.threshold_hex(0.0) == "0000"
    assert SAMP.threshold_hex(0.1) == "1999"
    assert SAMP.threshold_hex(0.5) == "8000"
    assert SAMP.threshold_hex(0.8) == "cccc"
    # fraction 1.0 must keep EVERY row, including bucket 'ffff' — the
    # sentinel 'g' sorts above all 4-hex buckets
    assert SAMP.threshold_hex(1.0) == "g"
    assert all(format(b, "04x") < "g" for b in (0, 0xFFFF))
    with pytest.raises(ValueError):
        SAMP.threshold_hex(1.5)


def test_sample_fraction_one_keeps_all(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    assert SAMP.deterministic_sample(docs, "doc_id", 1.0).count() == docs.count()


def test_sample_is_deterministic_and_near_rate(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    total = docs.count()
    s1 = sorted(r.doc_id for r in SAMP.deterministic_sample(docs, "doc_id", 0.2).collect())
    s2 = sorted(r.doc_id for r in SAMP.deterministic_sample(docs, "doc_id", 0.2).collect())
    assert s1 == s2  # same rows every run — no seed/partitioning dependence
    assert 0.05 * total < len(s1) < 0.45 * total  # loose at tiny n


def test_split_label_partitions_all_rows(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    counts = dict(
        docs.withColumn("split", SAMP.split_label("doc_id"))
        .groupBy("split")
        .count()
        .collect()
    )
    assert set(counts) <= {"train", "valid", "test"}
    assert sum(counts.values()) == docs.count()
    assert counts["train"] > counts.get("valid", 0)


def test_stratified_rates_differ_by_stratum(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    base = dict(docs.groupBy("lang").count().collect())
    kept = dict(
        SAMP.stratified_sample(docs, "doc_id", "lang", {"en": 0.05}, default=0.9)
        .groupBy("lang")
        .count()
        .collect()
    )
    # 'en' heavily downsampled; other strata mostly retained
    assert kept.get("en", 0) < 0.5 * base["en"]
    non_en_base = sum(v for k, v in base.items() if k != "en")
    non_en_kept = sum(v for k, v in kept.items() if k != "en")
    assert non_en_kept > 0.6 * non_en_base


def test_rebalance_to_targets_matches_python_replay(spark):
    """The kept set must equal a pure-Python replay of the integer
    threshold arithmetic + md5 bucketing — exact, no statistical slack."""
    import hashlib

    docs = read_table(spark, SF_SMOKE, "documents")
    base = docs.selectExpr("doc_id", "source", "n_chars AS w")
    targets = {"src0": 3}
    out = SAMP.rebalance_to_targets(
        base, "doc_id", "source", F.col("w"), targets=targets
    )
    rows = base.collect()
    totals: dict[str, int] = {}
    for r in rows:
        totals[r["source"]] = totals.get(r["source"], 0) + r["w"]
    k = min(c // targets.get(s, 1) for s, c in totals.items())
    thr = {s: (k * targets.get(s, 1) * 65536) // c for s, c in totals.items()}
    expected = {
        r["doc_id"]
        for r in rows
        if int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:4], 16)
        < thr[r["source"]]
    }
    got = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert got == expected
    # downsample-only: no stratum keeps more weight than it started with
    kept_tot: dict[str, int] = {}
    for r in out.collect():
        kept_tot[r["source"]] = kept_tot.get(r["source"], 0) + r["w"]
    assert all(kept_tot[s] <= totals[s] for s in kept_tot)


def test_rebalance_keeps_null_stratum_rows(spark):
    """NULL strata are a legitimate stratum: they must be counted,
    thresholded, and kept — not silently dropped by the threshold join."""
    rows = [(i, "a" if i % 3 == 0 else None, 10) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, src string, w long")
    out = SAMP.rebalance_to_targets(df, "doc_id", "src", F.col("w"))
    kept_null = out.filter(F.col("src").isNull()).count()
    # the NULL stratum is the larger one (60 rows vs 30) so it gets
    # downsampled toward the binding 'a' stratum — but never to zero
    assert kept_null > 0
    assert out.filter(F.col("src") == "a").count() > 0


def test_leakage_safe_split_never_separates_duplicates(spark):
    """The leakage invariant, end to end: every duplicate group maps to
    exactly ONE split (and with doc-keyed assignment the same corpus
    WOULD scatter at least one multi-copy group whenever one exists —
    the leak the operator closes)."""
    from pyspark.sql import functions as F

    from dend_spark_data_lake_spark.operators import sampling as SAMP
    from dend_spark_data_lake_spark.sources.io import read_table
    from tests.conftest import SF_SMOKE

    d = read_table(spark, SF_SMOKE, "documents").filter(F.trim("text") != "")
    h = F.md5(F.trim(F.lower(F.col("text"))).cast("binary")).alias("h")
    docs = d.select("doc_id", h)
    # group-keyed split: one distinct label per group, always
    by_group = docs.withColumn("split", SAMP.split_label("h"))
    spans = (
        by_group.groupBy("h")
        .agg(F.countDistinct("split").alias("k"), F.count("*").alias("n"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert spans == 0
    # doc-keyed split on the same corpus: if any multi-copy group exists,
    # show the leak is real (some group straddles splits) — this is the
    # failure mode split_leakage_safe exists to prevent
    by_doc = docs.withColumn("split", SAMP.split_label("doc_id"))
    multi = (
        by_doc.groupBy("h")
        .agg(F.countDistinct("split").alias("k"), F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )
    n_multi = multi.count()
    if n_multi >= 10:  # enough groups that hash scatter is near-certain
        assert multi.filter(F.col("k") > 1).count() > 0
