"""Sketch-family tests: accuracy vs exact answers, and partition-merge
associativity — the two properties that make sketches usable at scale.
Estimates are engine-specific, so these are locked here rather than in the
DuckDB oracle harness."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from dend_spark_data_lake_spark.functions import sketches as SK
from dend_spark_data_lake_spark.sources.io import read_table


def test_hll_estimate_close_to_exact_and_rollup_merges(spark):
    ev = read_table(spark, SF_SMOKE, "events")
    per_type = SK.hll_distinct(ev, "event_type", "user_id")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in per_type.collect():
        assert abs(r.n_distinct_est - exact[r.event_type]) <= max(
            3, 0.05 * exact[r.event_type]
        ), r.event_type

    # merging the per-type sketches must estimate the GLOBAL distinct count
    global_exact = ev.agg(F.countDistinct("user_id")).collect()[0][0]
    merged = SK.hll_rollup(per_type).collect()[0].n_distinct_est
    assert abs(merged - global_exact) <= max(3, 0.05 * global_exact)


def test_theta_set_algebra_close_to_exact(spark):
    ev = read_table(spark, SF_SMOKE, "events")
    got = SK.theta_set_cardinalities(
        ev, "user_id", F.col("event_type") == "click", F.col("event_type") == "purchase"
    ).collect()[0]
    a = {r.user_id for r in ev.filter("event_type = 'click'").select("user_id").collect()}
    b = {
        r.user_id for r in ev.filter("event_type = 'purchase'").select("user_id").collect()
    }
    for est, exact in [
        (got.n_a, len(a)),
        (got.n_b, len(b)),
        (got.n_union, len(a | b)),
        (got.n_intersect, len(a & b)),
        (got.n_a_minus_b, len(a - b)),
    ]:
        assert abs(est - exact) <= max(3, 0.05 * exact)


def test_kll_quantiles_within_rank_error(spark):
    li = read_table(spark, SF_SMOKE, "lineitem")
    got = SK.kll_quantiles(li, "l_extendedprice", [0.5, 0.9]).collect()[0]
    vals = sorted(r.l_extendedprice for r in li.select("l_extendedprice").collect())
    n = len(vals)
    # KLL error is on rank: the returned value's true rank must be within
    # ~2% of the requested quantile (k=200 guarantees ~0.8%; allow slack).
    import bisect

    for est, p in [(got.q50, 0.5), (got.q90, 0.9)]:
        rank = bisect.bisect_left(vals, est) / n
        assert abs(rank - p) < 0.02, (p, rank)


def test_heavy_hitters_finds_dominant_item(spark):
    df = spark.createDataFrame(
        [("hot",)] * 800 + [(f"cold{i}",) for i in range(200)], ["k"]
    )
    items = SK.heavy_hitters(df, ["k"], support=0.5).collect()[0]["k_freqItems"]
    assert "hot" in items
