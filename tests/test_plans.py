"""Physical-plan regression tests: lock in the scale properties that make
these queries viable at 100 TB — filters reaching the parquet scan, small
dims broadcast instead of shuffled, no accidental cartesian products, and
column pruning on wide scans. A refactor that silently loses one of these
still passes correctness tests; these tests are the guardrail.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from dend_spark_data_lake_spark.queries import REGISTRY


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def _pushed_nonempty(plan: str) -> int:
    return sum(
        1
        for line in plan.splitlines()
        if "PushedFilters: [" in line and "PushedFilters: []" not in line
    )


# (query, min broadcast joins, min scans with non-empty pushdown)
BROADCAST_AND_PUSHDOWN = [
    ("ref_star_join", 1, 1),
    ("agg_region_revenue", 3, 1),
    ("agg_ship_priority", 1, 3),
    ("ref_pricing_summary", 0, 1),
    ("sql_having_semijoin", 2, 0),
    ("topk_per_group", 0, 1),
    ("sql_disjunctive_join", 1, 1),
    ("impute_group_median", 1, 1),
    ("dedup_corpus", 1, 0),  # the corpus anti-join must broadcast the drop list
]


@pytest.mark.parametrize("name,min_bhj,min_pushed", BROADCAST_AND_PUSHDOWN)
def test_broadcast_and_pushdown(spark, name, min_bhj, min_pushed):
    plan = _plan(spark, name)
    assert plan.count("BroadcastHashJoin") >= min_bhj, plan
    assert _pushed_nonempty(plan) >= min_pushed, plan


# Queries where a planner regression could introduce a cartesian product.
# join_cross is excluded: it is the deliberate cross-join demonstration.
NO_CARTESIAN = [
    "ref_star_join",
    "agg_region_revenue",
    "agg_ship_priority",
    "sql_having_semijoin",
    "sql_scalar_subquery",
    "agg_customer_distribution",
    "join_asof",
    "dedup_ngram_jaccard",
    "sim_cosine_topk",
    "sql_exists_not_exists",
    "merge_upsert_customers",
    "ts_gapfill",
    "sql_disjunctive_join",
]


@pytest.mark.parametrize("name", NO_CARTESIAN)
def test_no_cartesian_product(spark, name):
    assert "CartesianProduct" not in _plan(spark, name)


def test_column_pruning_reaches_scan(spark):
    """A 2-column aggregate over 11-column lineitem must not read all 11."""
    plan = _plan(spark, "ref_dedup_keep_latest")
    scan_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan_lines, plan
    for line in scan_lines:
        schema = line.split("ReadSchema:")[1]
        assert schema.count(",") < 8, f"scan reads too many columns: {line}"


def test_sampling_filter_is_pre_shuffle(spark):
    """Deterministic sampling must be a scan-side filter, not post-shuffle:
    the whole point is discarding 90% of a 100 TB corpus before any
    exchange."""
    plan = _plan(spark, "sample_stratified")
    # Filter (with md5) must appear below the first Exchange in the tree
    lines = plan.splitlines()
    first_exchange = next(i for i, l in enumerate(lines) if "Exchange" in l)
    filter_lines = [i for i, l in enumerate(lines) if "md5" in l and "Filter" in l]
    assert filter_lines and all(i > first_exchange for i in filter_lines), plan


def test_scalar_subquery_decorrelates(spark):
    """The correlated scalar subquery must rewrite to aggregate+join —
    never a per-row re-scan (no nested subquery execution nodes)."""
    plan = _plan(spark, "sql_scalar_subquery")
    assert "Join" in plan
    assert "InSubqueryExec" not in plan and "ScalarSubquery" not in plan, plan


def test_global_topk_plans_as_take_ordered(spark):
    # orderBy+limit must compile to TakeOrderedAndProject (per-partition
    # top-k + merge), never a global sort — the difference between O(k) and
    # O(n log n) memory at 100 TB.
    for name in ("text_bigram_counts", "sort_limit_global"):
        assert "TakeOrderedAndProject" in _plan(spark, name), name


def test_q6_all_predicates_pushed(spark):
    """Q6 is pure scan efficiency: the date range, discount band, and
    quantity cap must ALL reach the parquet scan as pushed filters."""
    plan = _plan(spark, "sql_forecast_revenue")
    pushed = [l for l in plan.splitlines()
              if "PushedFilters: [" in l and "PushedFilters: []" not in l]
    assert pushed, plan
    joined = " ".join(pushed)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in joined, (col, joined)


def test_q18_q19_shapes(spark):
    """Q18: the HAVING subquery aggregate and customer dim must broadcast,
    and the top-20 must be TakeOrdered. Q19: the implied single-side bounds
    must reach both parquet scans (brand IN-list on part, quantity range on
    lineitem) with part broadcast — the difference between scanning 3
    brands' rows and the whole part table."""
    plan = _plan(spark, "sql_large_volume_customers")
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan

    plan = _plan(spark, "sql_discounted_revenue")
    assert plan.count("BroadcastHashJoin") >= 1, plan
    assert "CartesianProduct" not in plan, plan
    assert "p_brand" in plan and " IN (Brand#11,Brand#15,Brand#22)" in plan, plan
    assert _pushed_nonempty(plan) >= 2, plan


def test_tokenize_vocab_topk_is_take_ordered(spark):
    """tokenize_with_vocab's vocab build must heap-select the top-500
    before any no-partition window (same defect class as
    vocab_top_coverage: a global row_number over the full vocabulary is
    one task sorting every distinct token)."""
    plan = _plan(spark, "tokenize_with_vocab")
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.index("Window") < plan.index("TakeOrderedAndProject"), plan


def test_vocab_top_coverage_no_global_vocab_window(spark):
    """The top-100 must come from TakeOrderedAndProject (per-partition
    heaps), and the only Window node must sit ABOVE the limit — a global
    no-partition window over the full vocabulary would sort billions of
    distinct tokens into one task at corpus scale."""
    plan = _plan(spark, "vocab_top_coverage")
    assert "TakeOrderedAndProject" in plan, plan
    # the window's input must be the 100-row limited relation: in the tree
    # string the Window node appears above (before) TakeOrderedAndProject
    assert plan.index("Window") < plan.index("TakeOrderedAndProject"), plan
    # the scalar total joins in as a broadcast, not a shuffled window
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_sole_supplier_rewrite_scans_fact_fewer_times(spark):
    # the pre-aggregation rewrite must touch the fact strictly less often
    # than the decorrelated EXISTS/NOT-EXISTS form (3 scans -> 2)
    naive = _plan(spark, "sql_exists_not_exists").count("lineitem.parquet")
    rewrite = _plan(spark, "sql_sole_supplier_rewrite").count("lineitem.parquet")
    assert rewrite < naive, (rewrite, naive)


def test_spread_small_input_noop_at_scale_and_lazy(spark):
    """_spread_small_input's scale-safety contract, pinned (VERDICT r14
    ask #6): (a) an input that already has >= cores partitions gets NO
    RoundRobin exchange — at 100 TB the input arrives in thousands of
    scan partitions, so the helper must be a structural no-op there;
    (b) a single-partition input does get spread; (c) the partition-count
    probe is LAZY — it must not submit jobs even when the input plan
    contains exchanges (the old df.rdd probe finalized the adaptive plan,
    which eagerly runs upstream shuffle stages)."""
    from dend_spark_data_lake_spark.functions.similarity import (
        _spread_small_input,
    )

    p = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 1000, 1, p)
    plan = _spread_small_input(wide)._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" not in plan, plan
    assert "Exchange" not in plan, plan

    narrow = spark.range(0, 1000, 1, 1)
    plan2 = _spread_small_input(narrow)._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" in plan2, plan2

    tracker = spark.sparkContext.statusTracker()
    shuffled = spark.range(0, 100, 1, 2).repartition(5).selectExpr("id")
    before = len(tracker.getJobIdsForGroup())
    _spread_small_input(shuffled)
    after = len(tracker.getJobIdsForGroup())
    assert after == before, (before, after)


def test_fuzzy_join_has_no_nested_loop(spark):
    """The deletion-neighborhood blocking must keep the edit-distance join
    an equi-join: a BroadcastNestedLoopJoin here is the O(n²) regression
    that killed the round-1 version at scale."""
    plan = _plan(spark, "join_fuzzy_levenshtein")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "HashJoin" in plan, plan  # candidates come from a hash join on vh


def test_semantic_dedup_pair_stage_is_bucketed(spark):
    """dedup_semantic_corpus's pair mining must join on the centroid id —
    the only allowed cross join is corpus x broadcast(centroids) for
    assignment (k centroids, O(k) rows), never corpus x corpus."""
    from dend_spark_data_lake_spark.functions import similarity as SIM
    from dend_spark_data_lake_spark.sources.io import read_table

    spark.catalog.clearCache()  # a previously-cached assignment pass from
    # another test would double the rendered InMemoryRelation subtree
    emb = read_table(spark, SF_SMOKE, "embeddings")
    pairs = SIM.ivf_near_pairs(emb, threshold=0.4, centroid_mod=100, n_probe=2)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    # candidate generation is an equi-join (SortMerge or BroadcastHash) on cid
    assert "Join [cid" in plan.replace("SortMergeJoin", "Join").replace(
        "BroadcastHashJoin", "Join"
    ), plan
    # the ONLY nested-loop join allowed is the corpus x broadcast(centroids)
    # assignment pass (k centroids, O(k) broadcast side). It must be
    # persisted (InMemoryTableScan) so it runs once; the cached subtree's
    # text renders under BOTH self-join sides, hence <= 2 occurrences.
    assert "InMemoryTableScan" in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2, plan
    assert "CartesianProduct" not in plan, plan
    spark.catalog.clearCache()


def test_funnel_is_single_aggregate_no_join(spark):
    """The funnel is two stacked aggregations over ONE scan of events —
    a per-step self-join (the naive form) would scan the fact 3x and
    shuffle 3x."""
    plan = _plan(spark, "funnel_view_click_purchase")
    assert "Join" not in plan, plan
    assert plan.count("events.parquet") == 1, plan


def test_ewma_has_no_global_window(spark):
    """The EWMA fold must stay a grouped aggregate (per-key arrays),
    never a window over a global sort: 'Window' with an empty partition
    spec or a global Sort before aggregation is the scale regression."""
    plan = _plan(spark, "ts_ewma_per_customer")
    assert "Window" not in plan, plan  # fold is inside the aggregate
    # exactly one keyed exchange: scan -> partial agg -> shuffle -> final
    assert plan.count("Exchange") == 1, plan


def test_cohort_retention_single_fact_join(spark):
    """Cohort retention = first-seen aggregate + one equi-join back to the
    fact + final aggregate; both shuffles hash on user_id so AQE can reuse
    the exchange. A second join or a cartesian is a regression."""
    plan = _plan(spark, "cohort_retention")
    assert "CartesianProduct" not in plan, plan
    assert plan.count("Join") == 1, plan


def test_pack_sequences_is_single_shuffle_fold(spark):
    """Greedy packing must stay one keyed exchange (groupBy shard) with the
    fold inside the aggregate: a Window, a Join, or a second Exchange means
    the sequential recurrence leaked out of the bounded per-shard arrays."""
    plan = _plan(spark, "pack_sequences")
    assert plan.count("Exchange") == 1, plan
    assert "Window" not in plan and "Join" not in plan, plan


def test_rebalance_scans_corpus_exactly_twice(spark):
    """Mixture rebalancing = one counting pass + one broadcast-threshold
    filter pass. A third scan (agg+crossJoin planning of the binding
    minimum) or a shuffled corpus join is the 100 TB regression."""
    plan = _plan(spark, "corpus_mix_rebalance")
    assert plan.count("documents.parquet") == 2, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_revenue_concentration_plans_scalar_not_join(spark):
    """The global-total threshold must plan as a scalar subquery feeding
    the HAVING filter — two scans of the fact, but never a row-to-row
    join of the two aggregates."""
    plan = _plan(spark, "sql_revenue_concentration")
    assert plan.count("lineitem.parquet") == 2, plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan, plan


def test_key_skew_profile_caches_counts_and_takeordered(spark):
    """The profiler's counts feed both the grand total and the top-N from
    ONE cached pass over the fact, and the top-N must be TakeOrdered
    (per-partition heap), never a global sort."""
    spark.catalog.clearCache()
    plan = _plan(spark, "profile_key_skew")
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("InMemoryTableScan") >= 2, plan  # both consumers hit cache
    spark.catalog.clearCache()


def test_quantization_has_no_shuffle(spark):
    """Int8 quantization is per-row array math: any Exchange in the plan
    means it stopped running at scan speed."""
    plan = _plan(spark, "embed_quantize_int8")
    assert "Exchange" not in plan, plan


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """Hive-partitioned fact joined to a filtered dim must get a runtime
    PartitionFilter injected (dynamic partition pruning): at 100 TB this
    is the difference between scanning 3 partitions and scanning all of
    them. Locks the session config keeping DPP live."""
    from dend_spark_data_lake_spark.sources.io import read_table

    ev = read_table(spark, SF_SMOKE, "events").select(
        "event_id", "event_type", "value"
    )
    path = str(tmp_path / "ev_part")
    ev.write.partitionBy("event_type").parquet(path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("view", "keep"), ("click", "keep"), ("purchase", "drop")],
        ["event_type", "disposition"],
    ).filter("disposition = 'keep'")
    j = fact.join(dim, "event_type").groupBy("event_type").count()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan


def test_incremental_dedup_stays_on_hash_joins(spark):
    """Batch-vs-corpus mining must be band equi-joins end to end: a
    cartesian or nested-loop anywhere means the blocking broke and the
    ingest cost went quadratic."""
    for name in ("dedup_incremental_batch", "pipeline_incremental_ingest"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "BroadcastHashJoin" in plan, name


def test_ttr_hapax_is_shuffle_free(spark):
    """Per-doc TTR/hapax is a sorted-array fold — a pure narrow
    transformation. Any Exchange beyond the final presentation sort's
    range partitioning (or an explode + re-aggregate rewrite that shuffles
    on (doc, token)) means the map-side fold regressed into a corpus-wide
    shuffle."""
    plan = _plan(spark, "text_ttr_hapax")
    assert "HashAggregate" not in plan and "ObjectHashAggregate" not in plan, plan
    assert "Generate" not in plan, plan  # no explode path
    # only the orderBy's rangepartitioning may appear
    exchanges = [l for l in plan.splitlines() if "Exchange" in l]
    assert all("rangepartitioning" in l for l in exchanges), plan


def test_winsorize_broadcasts_cuts_never_shuffles_fact_for_join(spark):
    """The per-group percentile cut table (|groups| rows) must come back
    onto the fact as a BroadcastHashJoin; a SortMergeJoin here shuffles
    the full fact table a second time for a 3-row dim."""
    plan = _plan(spark, "winsorize_prices")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_vocab_window_runs_on_aggregated_vocab_only(spark):
    """The coverage window must consume the AGGREGATED token counts
    (map-side partial + one keyed exchange), never raw corpus rows: the
    Window's child has to be the aggregate, and the token count must be
    partial-aggregated (two HashAggregate phases) before any window."""
    plan = _plan(spark, "vocab_top_coverage")
    assert "Window" in plan, plan
    assert plan.count("HashAggregate") >= 2, plan  # partial + final count


def test_tokenize_maps_ids_via_broadcast(spark):
    """The vocab→id mapping must ride a BroadcastHashJoin on the exploded
    token stream; a SortMergeJoin here shuffles the whole tokenized corpus
    against a 500-row dim."""
    plan = _plan(spark, "tokenize_with_vocab")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_quality_curve_is_single_scan_no_join(spark):
    """The threshold curve folds 14 conditional sums into one corpus pass;
    any Join (the oracle's docs x thresholds cross product) or a second
    scan is the scale regression."""
    plan = _plan(spark, "quality_threshold_curve")
    assert "Join" not in plan, plan
    assert plan.count("documents.parquet") == 1, plan


def test_boilerplate_join_is_equi_not_cartesian(spark):
    """The boilerplate membership join keys on the shingle (equi hash
    join over the already-shuffled-by-shingle relation); a nested-loop or
    cartesian here compares every doc-shingle to every boilerplate gram."""
    plan = _plan(spark, "boilerplate_frequent_grams")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_temperature_sampling_broadcasts_thresholds(spark):
    """The per-language keep-thresholds (|langs| rows) must broadcast onto
    the corpus scan; a SortMergeJoin would shuffle the whole corpus for a
    five-row dimension."""
    plan = _plan(spark, "sample_temperature_by_lang")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_kfold_assign_has_no_join(spark):
    """Fold assignment is a pure narrow map + one combinable aggregate —
    any join in the plan is a regression."""
    plan = _plan(spark, "sample_kfold_assign")
    assert "Join" not in plan, plan
    assert plan.count("HashAggregate") >= 2, plan  # partial + final


def test_small_order_revenue_broadcasts_brand_dim(spark):
    """Q17 shape: the brand-filtered part dim rides a BroadcastHashJoin
    and the brand predicate reaches the part scan as a pushed filter; the
    per-part aggregate and the join-back share the l_partkey hash."""
    plan = _plan(spark, "sql_small_order_revenue")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert _pushed_nonempty(plan) >= 1, plan


def test_top_supplier_pushes_ship_window_to_scan(spark):
    """Q15 shape: the 6-month ship window must prune at the lineitem scan
    (PushedFilters), and the supplier dim must broadcast."""
    plan = _plan(spark, "sql_top_supplier")
    assert _pushed_nonempty(plan) >= 1, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_inactive_high_balance_anti_join_on_pruned_orders(spark):
    """Q22 shape: the inactivity check is a LeftAnti join whose right side
    is the date-filtered orders scan (pushdown prunes the fact before the
    join); nation must broadcast."""
    plan = _plan(spark, "sql_inactive_high_balance")
    assert "LeftAnti" in plan, plan
    assert _pushed_nonempty(plan) >= 1, plan
    assert "BroadcastHashJoin" in plan, plan


def test_source_overlap_joins_on_vocabulary_not_docs(spark):
    """The source-similarity matrix self-joins the DISTINCT (source,
    shingle) vocabulary on the shingle — an equi join; a cartesian or
    nested-loop plan would pair documents instead of vocabulary rows."""
    plan = _plan(spark, "profile_source_overlap")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_containment_prunes_inner_side_no_cartesian(spark):
    """Containment candidates must come from the asymmetric prefix
    equi-join (contained side pruned to its rarest shingles); a cartesian
    or nested-loop plan means the prefix filter was lost."""
    plan = _plan(spark, "dedup_containment")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_commonness_df_join_reuses_token_key(spark):
    """The df join-back keys on the token, the same key as the df
    aggregate — no cartesian, no nested loop; the doc-count scalar rides
    a 1-row broadcast."""
    plan = _plan(spark, "text_commonness")
    assert "CartesianProduct" not in plan, plan


def test_q5_shape_broadcasts_all_dims_single_fact_shuffle(spark):
    """Q5 shape: customer/supplier/nation/region all broadcast; the only
    exchange pair is lineitem-orders on the order key; the local-supplier
    correlation must not add a shuffle."""
    plan = _plan(spark, "sql_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert _pushed_nonempty(plan) >= 1, plan  # orderdate window
    assert "CartesianProduct" not in plan, plan


def test_q8_shape_single_pass_conditional_share(spark):
    """Q8 shape: numerator and denominator are conditional sums in ONE
    aggregate — the fact must be scanned once, dims broadcast."""
    plan = _plan(spark, "sql_market_share")
    assert plan.count("lineitem.parquet") == 1, plan
    assert plan.count("BroadcastHashJoin") >= 5, plan


def test_q10_shape_takeordered_top20(spark):
    """Q10 shape: the top-20 must plan as TakeOrdered(AndProject), never a
    global Sort; returnflag + date window push to the scans."""
    plan = _plan(spark, "sql_returned_items")
    assert "TakeOrdered" in plan, plan
    assert _pushed_nonempty(plan) >= 2, plan


def test_q14_shape_broadcast_part_single_row(spark):
    """Q14 shape: part broadcasts onto the month-pruned lineitem scan; the
    share is computed in the same aggregate pass (no second scan)."""
    plan = _plan(spark, "sql_promo_revenue")
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("lineitem.parquet") == 1, plan
    assert _pushed_nonempty(plan) >= 1, plan


def test_plan_audit_counts_known_shapes(spark):
    """plan_audit must report the features the other plan tests assert
    individually: the star join shows broadcasts and zero quadratic joins;
    a deliberate cross join shows up in the nested-loop/cartesian
    counters."""
    from dend_spark_data_lake_spark.operators.diagnostics import plan_audit

    star = plan_audit(REGISTRY["ref_star_join"].fn(spark, SF_SMOKE))
    assert star["broadcast_joins"] >= 1
    assert star["cartesian"] == 0 and star["nested_loop_joins"] == 0
    assert star["scans_with_pushdown"] >= 1

    cross = plan_audit(REGISTRY["join_cross"].fn(spark, SF_SMOKE))
    assert cross["cartesian"] + cross["nested_loop_joins"] >= 1

    # audits must be stable across execution: an executed AQE plan prints
    # final + initial sections, which must not double the counters, and a
    # pure broadcast join must report zero shuffle exchanges
    from pyspark.sql import functions as F

    big = spark.range(1000).withColumn("k", F.col("id") % 10)
    small = spark.range(10).withColumnRenamed("id", "k")
    j = big.join(F.broadcast(small), "k")
    pre = plan_audit(j)
    j.collect()
    post = plan_audit(j)
    assert pre["exchanges"] == post["exchanges"] == 0
    assert pre["broadcast_joins"] == post["broadcast_joins"] == 1
    assert post["codegen_spans"] >= 1  # final plan shows *(N) spans


def test_curation_composite_broadcasts_all_small_sides(spark):
    """The curation flagship must keep every small relation (contaminated
    ids, eval vocabulary, language thresholds) on broadcast joins and never
    plan a cartesian; the fingerprint dedup is the only corpus-keyed window."""
    plan = _plan(spark, "pipeline_curation")
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "LeftAnti" in plan, plan


def test_interval_overlap_is_equi_join_not_nested_loop(spark):
    """The interval-overlap join must ride the (key, bucket) equi-join;
    a BroadcastNestedLoopJoin or cartesian means the two-sided range
    predicate leaked into the join itself."""
    plan = _plan(spark, "join_interval_overlap")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_freq_spectrum_two_combinable_aggregates_single_scan(spark):
    """The frequency spectrum is two back-to-back partial-aggregated
    rollups over ONE corpus scan — a join or second scan is the scale
    regression."""
    plan = _plan(spark, "vocab_freq_spectrum")
    assert "Join" not in plan, plan
    assert plan.count("documents.parquet") == 1, plan
    assert plan.count("HashAggregate") >= 4, plan  # partial+final x2


# ---------------------------------------------------------------------------
# Round-4 additions
# ---------------------------------------------------------------------------

# Cartesian products would be planner regressions in all of these. The
# deliberate bounded cross joins (ts_lagged_correlation's 8-row lag grid,
# sql_sales_opportunity's 1-row aggregate) broadcast and are asserted
# separately.
R4_NO_CARTESIAN = [
    "sql_intersect_except_all",
    "window_gaps_islands",
    "ts_ohlc_hourly",
    "orders_gap_stats",
    "events_dow_hour_heatmap",
    "doc_entropy_unigram",
    "embed_label_distance_matrix",
    "corpus_upsample_fractional",
    "ts_lagged_correlation",
    "dq_referential_orphans",
    "dedup_band_stats",
    "dedup_prefix_fingerprint",
    "customer_ltv_deciles",
    "sql_product_profit",
    "sql_waiting_orders",
    "sql_revenue_share_window",
    "sql_rollup_share_of_parent",
    "market_basket_pairs",
    "attribution_linear_credit",
    "text_cooccurrence_pmi",
    "vocab_oov_rate",
    "graph_pagerank_nations",
    "window_percent_change",
    "events_type_transitions",
    "agg_salted_twophase",
    "agg_incremental_merge",
    "sim_ivf_index_stats",
    "profile_dup_source_matrix",
    "events_adjacent_dedup",
    "text_bigram_surprisal",
]


@pytest.mark.parametrize("name", R4_NO_CARTESIAN)
def test_r4_no_cartesian(spark, name):
    assert "CartesianProduct" not in _plan(spark, name)


def test_product_profit_broadcasts_three_dims(spark):
    """Q9 shape: part/supplier/nation broadcast; only the orders join may
    shuffle the fact."""
    plan = _plan(spark, "sql_product_profit")
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_waiting_orders_single_grouped_pass(spark):
    """Q21 shape rewritten as ONE grouped pass over the order's lines —
    the correlated EXISTS/NOT EXISTS pair would show up as extra joins."""
    plan = _plan(spark, "sql_waiting_orders")
    assert plan.count("lineitem.parquet") == 1, plan
    assert plan.count("BroadcastHashJoin") >= 1, plan  # supplier dim


def test_sales_opportunity_broadcast_scalar_and_anti_join(spark):
    """Q22 shape: the positive-balance aggregate broadcasts (1 row) and
    the no-orders predicate is an anti-join, not a second scan + IN."""
    plan = _plan(spark, "sql_sales_opportunity")
    assert "BroadcastNestedLoopJoin" in plan, plan  # 1-row cross broadcast
    assert "LeftAnti" in plan, plan


def test_market_basket_takeordered_and_equi_join(spark):
    """Top-50 must be TakeOrderedAndProject (no global sort) and the pair
    generation an equi-join on orderkey (a<b as residual filter)."""
    plan = _plan(spark, "market_basket_pairs")
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_attribution_range_join_is_bucketed_equi(spark):
    """The hour-window view-purchase join must run as an equi-join on the
    time bucket — a raw inequality join degenerates to nested loop."""
    plan = _plan(spark, "attribution_linear_credit")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_oov_vocab_broadcasts_and_topk(spark):
    plan = _plan(spark, "vocab_oov_rate")
    assert "TakeOrderedAndProject" in plan, plan  # top-20 vocabulary
    assert "BroadcastHashJoin" in plan, plan  # vocab joins broadcast


def test_pmi_frequency_joins_broadcast(spark):
    """Document frequencies and the corpus size join back as broadcasts;
    the only data-sized join is the doc_id self-equi-join."""
    plan = _plan(spark, "text_cooccurrence_pmi")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_pagerank_iteration_stays_distributed(spark):
    """Ranks must flow through joins + keyed sums (no collect of the rank
    relation is observable; the plan ends in checkpointed scans), and the
    edge build broadcasts its dims."""
    plan = _plan(spark, "graph_pagerank_nations")
    assert "ExistingRDD" in plan or "Scan" in plan, plan  # checkpoint feeds
    assert "CartesianProduct" not in plan, plan


def test_share_windows_run_on_aggregated_relations(spark):
    """Both percent-of-total queries window over the nation-level
    AGGREGATE: the Window must sit above a HashAggregate, never directly
    on a scan-sized relation."""
    for name in ("sql_revenue_share_window", "sql_rollup_share_of_parent"):
        plan = _plan(spark, name)
        assert "Window" in plan, plan
        w_pos = plan.index("Window")
        assert "HashAggregate" in plan[w_pos:], (name, plan)


def test_ltv_decile_two_pass_no_global_row_sort(spark):
    """VERDICT r4 ask #2: the engine must run the two-pass distributed
    ntile rewrite — NO unpartitioned ntile/window over the per-customer
    relation. Locks: (a) no ntile in the physical plan; (b) the
    row-sized window is keyed by pid (local rank within a range
    partition); (c) the offset table is broadcast; (d) the range
    shuffle on the sort key is present; (e) the only global Sort is the
    final 10-row decile orderBy."""
    plan = _plan(spark, "customer_ltv_deciles")
    assert "ntile" not in plan, plan
    assert "windowspecdefinition(__pid#" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "rangepartitioning(cents#" in plan, plan
    # every GLOBAL sort (flag `true`) must order by decile — the 10-row
    # output sort — never by the customer-level sort key
    import re as _re

    for m in _re.finditer(r"Sort \[([^\]]*)\], true", plan):
        assert "decile" in m.group(1), m.group(0)


def test_sessionization_windows_are_keyed_by_user(spark):
    """No unpartitioned window may appear: every window spec partitions
    by user_id."""
    plan = _plan(spark, "events_sessionization")
    import re as _re

    for m in _re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "user_id" in m.group(1), m.group(0)


def test_q2_shape_broadcasts_region_chain_once(spark):
    """The EUROPE supplier list broadcasts into the fact; the min join-back
    must not introduce a cartesian or nested loop."""
    plan = _plan(spark, "sql_min_price_supplier")
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_q11_shape_single_fact_pass_with_scalar_total(spark):
    """The per-part aggregate feeds both the output and the 1-row total:
    AQE must REUSE the aggregate's exchange at runtime (one physical
    lineitem pass), and the total joins back as a 1-row broadcast."""
    df = REGISTRY["sql_important_stock"].fn(spark, SF_SMOKE)
    df.collect()  # reuse is visible only in the final adaptive plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan  # the 1-row total


def test_q16_shape_anti_join_broadcast(spark):
    plan = _plan(spark, "sql_parts_supplier_relation")
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q20_shape_pushes_ship_year_and_shares_shuffle(spark):
    plan = _plan(spark, "sql_excess_inventory_suppliers")
    assert _pushed_nonempty(plan) >= 1, plan  # ship-year window at the scan
    assert "CartesianProduct" not in plan, plan


R5_QUEUE_NO_CARTESIAN = [
    "sql_min_price_supplier",
    "supplier_share_hhi",
    "window_cumulative_distinct",
    "ts_anomaly_mad",
    "dedup_minhash_calibration",
    "ts_rolling_distinct_users",
    "agg_weighted_median",
    "dq_snapshot_diff",
]


@pytest.mark.parametrize("name", R5_QUEUE_NO_CARTESIAN)
def test_r5_queue_no_cartesian(spark, name):
    assert "CartesianProduct" not in _plan(spark, name)


def test_mad_windows_run_on_grid_not_events(spark):
    """Both MAD medians must window over the aggregated cents grid —
    every window spec partitions by event_type (no global window) — and
    the multiply-referenced grid aggregate must be exchange-REUSED at
    runtime rather than re-scanning events per reference."""
    import re as _re

    df = REGISTRY["ts_anomaly_mad"].fn(spark, SF_SMOKE)
    df.collect()  # reuse appears only in the final adaptive plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    for m in _re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "event_type" in m.group(1), m.group(0)
    assert plan.count("ReusedExchange") >= 4, plan


def test_source_divergence_aggregates_corpus_once(spark):
    """The (source, token) count relation is the only corpus-sized
    aggregate: the documents scan must appear exactly once per distinct
    use (counts / vocab / sources all derive from it)."""
    plan = _plan(spark, "profile_source_divergence")
    assert "CartesianProduct" not in plan, plan


def test_rolling_distinct_semi_join_broadcasts_days(spark):
    plan = _plan(spark, "ts_rolling_distinct_users")
    assert "LeftSemi" in plan, plan


def test_salted_twophase_single_scan_two_aggregate_pairs(spark):
    """The salted rewrite must stay one events scan feeding two
    partial+final aggregate pairs — a second scan or a join would mean
    the phases were planned as separate passes."""
    plan = _plan(spark, "agg_salted_twophase")
    assert plan.count("events.parquet") == 1, plan
    assert plan.count("HashAggregate") >= 4, plan
    assert "Join" not in plan, plan


def test_incremental_merge_partials_stay_aggregates(spark):
    """Snapshot and delta sides each aggregate BEFORE the union — the
    final combine must run on partial rows (4+ HashAggregates, union of
    two filtered scans, no join anywhere)."""
    plan = _plan(spark, "agg_incremental_merge")
    assert plan.count("orders.parquet") == 2, plan
    assert plan.count("HashAggregate") >= 6, plan
    assert "Join" not in plan, plan
    assert _pushed_nonempty(plan) >= 2, plan  # date filter pushed both sides


def test_dup_source_matrix_joins_aggregated_fingerprints(spark):
    """The self-join must run on the (fingerprint, source, count)
    AGGREGATE, never on raw documents: exactly two documents scans (one
    per join side), each feeding an aggregate below the join, and the
    join itself hashed — BNLJ/cartesian here would be quadratic in docs."""
    plan = _plan(spark, "profile_dup_source_matrix")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("documents.parquet") == 2, plan


def test_bigram_surprisal_joins_keyed_by_bigram(spark):
    """LM scoring must join doc bigrams to the count tables on the
    bigram/unigram keys (hash joins); the only nested-loop is the 1-row
    vocabulary broadcast."""
    plan = _plan(spark, "text_bigram_surprisal")
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan


def test_adjacent_dedup_window_keyed_by_user(spark):
    """The run-start lag window must partition by user_id (in-partition
    sort, no global window) and feed one combinable per-type rollup."""
    import re as _re

    plan = _plan(spark, "events_adjacent_dedup")
    for m in _re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "user_id" in m.group(1), m.group(0)
    assert plan.count("events.parquet") == 1, plan


def test_point_in_time_join_is_asof_not_inequality(spark):
    """The SCD2 containment join must plan as the as-of rewrite (union +
    keyed window over ONE shuffle) — any BroadcastNestedLoopJoin or
    CartesianProduct means the BETWEEN form leaked through and the join
    went quadratic per key."""
    import re as _re

    plan = _plan(spark, "join_point_in_time")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Union" in plan, plan
    for m in _re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "user_id" in m.group(1), m.group(0)


def test_psi_single_scan_broadcast_total(spark):
    """PSI computes both windows' counts in one conditional aggregate;
    the 1-row totals reference the same aggregate, so at runtime the
    per-type exchange must be REUSED (one physical events scan), with
    only the 1-row totals broadcast joined back."""
    df = REGISTRY["profile_psi_event_types"].fn(spark, SF_SMOKE)
    df.collect()  # reuse appears only in the final adaptive plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ReusedExchange") >= 1, plan
    # the only nested-loop is the 1-row totals broadcast (the adaptive
    # plan string repeats the node in its Initial Plan section)
    assert plan.count("BroadcastNestedLoopJoin") <= 2, plan
    assert "CartesianProduct" not in plan, plan


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE's runtime skew handling is the engine's first line of defense
    for hot join keys at 100 TB (explicit salting — salted_equi_join —
    is the second): one key holding ~all the left rows must make AQE
    mark the sort-merge join skewed and split the hot partition into
    advisory-sized reads. Locks the capability (configs + runtime
    re-plan), not just documentation."""
    import pyspark.sql.functions as F

    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    ]
    saved = {}
    for k in keys:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        # payload must be INCOMPRESSIBLE (md5 per row): shuffle blocks are
        # compressed, and a constant pad deflates below the skew threshold
        left = spark.range(0, 50_000).select(
            F.when(F.col("id") < 49_800, F.lit(0))
            .otherwise(F.col("id") % 200)
            .alias("k"),
            F.concat(
                F.md5(F.col("id").cast("string")),
                F.md5((F.col("id") + 1).cast("string")),
                F.md5((F.col("id") + 2).cast("string")),
            ).alias("payload"),
        )
        right = spark.range(0, 200).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("dim_val")
        )
        # the join must be the stage's TOP operator: any operator above it
        # in the same adaptive plan (even a distribution-free global
        # aggregate) suppressed the split in this build — a real scale
        # lesson that skew handling and downstream-operator fusion trade
        # off, and why the explicit salted_equi_join exists as the
        # always-available fallback
        j = left.join(right, "k")
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
        assert "skewed" in plan, plan  # AQEShuffleRead marks the split read
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_interval_merge_single_user_partitioning(spark):
    """Both island windows and the aggregates must ride ONE user_id hash
    partitioning over a single events scan — a self-join here would be
    the quadratic BETWEEN-overlap formulation this rewrite replaces."""
    import re as _re

    plan = _plan(spark, "intervals_merge_coverage")
    assert "Join" not in plan, plan
    assert plan.count("events.parquet") == 1, plan
    for m in _re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "user_id" in m.group(1), m.group(0)


def test_grouping_flags_is_expand_aggregate(spark):
    """GROUPING() over CUBE must stay one Expand + combinable aggregate —
    no join, no second scan."""
    plan = _plan(spark, "sql_grouping_flags")
    assert "Expand" in plan, plan
    assert "Join" not in plan, plan
    assert plan.count("orders.parquet") == 1, plan


def test_open_backlog_window_runs_on_daily_grid(spark):
    """The sweep-line backlog must window over the AGGREGATED daily-delta
    grid, never the raw relations: exactly one orders + one lineitem
    scan feeding a Union of the +1/-1 events, and the cumulative window
    above the date-keyed aggregate."""
    plan = _plan(spark, "orders_open_backlog")
    assert "CartesianProduct" not in plan, plan
    assert "Union" in plan, plan
    assert plan.index("Window") < plan.index("HashAggregate"), plan


def test_q4_shape_decorrelates_with_pushdown(spark):
    """Q4's correlated EXISTS must decorrelate to a LeftSemi and the
    quarter window must prune the orders scan."""
    plan = _plan(spark, "sql_order_priority_check")
    assert "LeftSemi" in plan, plan
    assert "CartesianProduct" not in plan, plan
    pushed = [l for l in plan.splitlines()
              if "PushedFilters: [" in l and "o_orderdate" in l]
    assert pushed, plan


def test_higher_moments_single_combinable_pass(spark):
    """Four exact power sums must come from ONE scan and one combinable
    aggregate — no join, no window, no second pass."""
    plan = _plan(spark, "agg_higher_moments")
    assert "Join" not in plan and "Window" not in plan, plan
    assert plan.count("orders.parquet") == 1, plan
    assert plan.count("HashAggregate") >= 2, plan  # partial + final


def test_allocation_windows_groups_not_documents(spark):
    """Largest-remainder allocation must window over the |groups|-bounded
    relation only — the documents scan feeds exactly one aggregate."""
    plan = _plan(spark, "alloc_largest_remainder")
    assert "CartesianProduct" not in plan, plan
    assert plan.index("Window") < plan.index("HashAggregate"), plan


def test_topk_with_ties_broadcasts_dim(spark):
    plan = _plan(spark, "topk_with_ties")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_stream_hygiene_no_branch_joins_raw_events(spark):
    """Every hygiene branch must reduce to O(1)/O(groups) rows before
    the 5-row union — no join against raw events anywhere, and all
    user windows keyed by user_id."""
    import re as _re

    plan = _plan(spark, "pipeline_stream_hygiene")
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    for m in _re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "user_id" in m.group(1), m.group(0)


def test_linear_regression_single_combinable_pass(spark):
    plan = _plan(spark, "agg_linear_regression")
    assert "Join" not in plan and "Window" not in plan, plan
    assert plan.count("lineitem.parquet") == 1, plan


def test_zipf_fit_topk_is_take_ordered(spark):
    """The vocabulary top-100 must heap-select (TakeOrdered) with the
    rank window running on the 100-row relation — the vocab_top_coverage
    defect class guard."""
    plan = _plan(spark, "text_zipf_fit")
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.index("Window") < plan.index("TakeOrderedAndProject"), plan


def test_benford_single_scan_broadcast_total(spark):
    plan = _plan(spark, "dq_benford_first_digit")
    assert plan.count("orders.parquet") <= 2, plan  # self-ref total may reuse
    assert "CartesianProduct" not in plan, plan


def test_proportional_carve_quota_is_broadcast(spark):
    """The data-driven quota relation must BROADCAST into the ranked
    corpus join; the carve rank window must partition by lang."""
    import re as _re

    plan = _plan(spark, "sample_proportional_carve")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    specs = _re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    # the corpus rank window partitions by lang (its md5 sort key is
    # pre-projected as _w0); the only unpartitioned window is the
    # |langs|-row remainder ranking
    assert any(s.startswith("lang") for s in specs), specs


def test_ood_scoring_broadcasts_centroids(spark):
    """OOD scoring must broadcast the |labels| x dim centroid relation
    into the pos-keyed join — never a vector-pair join."""
    plan = _plan(spark, "embed_ood_maxcos")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_seasonal_backtest_joins_daily_grid(spark):
    """The d-7 forecast join must run on the bounded daily aggregate —
    one events scan per side at most, no window over raw events."""
    plan = _plan(spark, "ts_seasonal_backtest")
    assert "CartesianProduct" not in plan, plan
    assert "Window" not in plan, plan


def test_trimmed_mean_grid_windows_per_group(spark):
    """The trimmed-mean cumulative window must run over the per-group
    distinct-cents grid (partitioned by l_returnflag) — never the raw
    relation, and no sort of raw rows anywhere."""
    import re as _re

    plan = _plan(spark, "agg_trimmed_mean")
    assert "CartesianProduct" not in plan, plan
    for m in _re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "l_returnflag" in m.group(1), m.group(0)


def test_keyless_grid_percentiles_cumulate_distributed(spark):
    """The keyless counting-grid percentile family (weighted median,
    equidepth boundaries) must run its global cumulative count via the
    range-partition + pid-local-window + broadcast-offset rewrite — an
    unpartitioned window ordered by the VALUE column would collapse the
    whole distinct-value grid onto one task (the last borderline site
    VERDICT r4 flagged)."""
    import re as _re

    for name in ("agg_weighted_median", "agg_histogram_equidepth"):
        plan = _plan(spark, name)
        assert "windowspecdefinition(__pid#" in plan, (name, plan)
        # no window may order by the grid value WITHOUT a partition key
        # (an unpartitioned spec's first element is the ORDER BY column,
        # rendered "value ASC ..."; keyed specs lead with the key)
        bad = _re.findall(
            r"windowspecdefinition\((?:l_extendedprice|cents)#\d+ ASC", plan
        )
        assert not bad, (name, bad)


def test_weighted_reservoir_is_take_ordered(spark):
    """sample_weighted_reservoir must plan the top-k as
    TakeOrderedAndProject (per-partition k-row heaps) — never a global
    range-partitioned sort of the corpus — and the rank window must run
    AFTER the limit, i.e. ordered by the projected es_key, over k rows."""
    plan = _plan(spark, "sample_weighted_reservoir")
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning(es_key" not in plan, plan


def test_hard_negatives_broadcast_no_shuffle_of_corpus(spark):
    """sim_hard_negatives: the query block must broadcast (the corpus is
    scanned once, never shuffled) and the ranking window must partition by
    query_id — bounded by the query-block contract."""
    plan = _plan(spark, "sim_hard_negatives")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert "windowspecdefinition(query_id#" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_shard_audit_window_over_shard_aggregate_only(spark):
    """shard_balance_audit: the single-partition deviation window must
    consume the 32-row shard aggregate (its input exchange follows the
    final HashAggregate), and the corpus aggregate itself must have a
    map-side partial."""
    plan = _plan(spark, "shard_balance_audit")
    assert "partial_count" in plan, plan
    # the only SinglePartition exchange sits above the keyed aggregate
    pre, _, post = plan.partition("Exchange SinglePartition")
    assert post, plan
    assert "HashAggregate" in post, plan


def test_length_buckets_single_combinable_pass(spark):
    """pack_length_buckets: one scan, partial+final hash aggregate on the
    bucket key — no join, no window, no second scan of documents."""
    plan = _plan(spark, "pack_length_buckets")
    assert "partial_count" in plan, plan
    assert "Join" not in plan and "windowspecdefinition" not in plan, plan
    assert plan.count("FileScan parquet") == 1, plan


def test_source_cap_prunes_before_shuffle(spark):
    """curation_source_cap: the rank<=15 filter must trigger the
    WindowGroupLimit rewrite with a PARTIAL (pre-shuffle) stage, so each
    task ships at most 15 rows per source instead of the corpus."""
    plan = _plan(spark, "curation_source_cap")
    assert "WindowGroupLimit" in plan, plan
    assert "Partial" in plan.split("Exchange", 1)[1] or "Partial" in plan, plan
    pre_exchange = plan.split("Exchange hashpartitioning(source", 1)[1]
    assert "WindowGroupLimit" in pre_exchange, plan


def test_bloom_audit_broadcasts_filter_and_build(spark):
    """dq_bloom_filter_audit: both small sides (the <=m-row position set
    and the distinct build keys) must broadcast; the customer side is
    never cartesian-joined."""
    plan = _plan(spark, "dq_bloom_filter_audit")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "CartesianProduct" not in plan, plan
    assert "partial_count" in plan, plan


def test_token_budget_no_unpartitioned_doc_window(spark):
    """curation_token_budget: the only doc-level cumulative must run
    pid-partitioned (the global_cumulative_counts rewrite); unpartitioned
    windows may only order by the bounded score grid."""
    import re as _re

    plan = _plan(spark, "curation_token_budget")
    assert "windowspecdefinition(__pid#" in plan, plan
    bad = _re.findall(r"windowspecdefinition\(doc_id#\d+ ASC", plan)
    assert not bad, (bad, plan)


def test_asof_tolerance_same_shape_as_asof(spark):
    """join_asof_tolerance: the tolerance mask must not change the as-of
    plan family — single hash shuffle union+window, no inequality
    cross-product fallback."""
    plan = _plan(spark, "join_asof_tolerance")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "windowspecdefinition(user_id#" in plan, plan


def test_global_ids_no_unpartitioned_doc_window(spark):
    """ids_global_stable: gid assignment must be the pid-window rewrite;
    no unpartitioned window may order by doc_id."""
    import re as _re

    plan = _plan(spark, "ids_global_stable")
    assert "windowspecdefinition(__pid#" in plan, plan
    bad = _re.findall(r"windowspecdefinition\(doc_id#\d+ ASC", plan)
    assert not bad, (bad, plan)


def test_epoch_schedule_prunes_before_shuffle(spark):
    """epoch_shuffle_schedule: pos <= 5 must trigger a partial
    WindowGroupLimit before the epoch shuffle."""
    plan = _plan(spark, "epoch_shuffle_schedule")
    assert "WindowGroupLimit" in plan, plan
    pre = plan.split("Exchange hashpartitioning(epoch", 1)
    assert len(pre) == 2 and "WindowGroupLimit" in pre[1], plan


def test_bootstrap_windows_per_lang_only(spark):
    """stats_bootstrap_ci: the replicate ranking window must partition by
    lang (32 rows per partition); the corpus aggregate must have a
    map-side partial."""
    import re as _re

    plan = _plan(spark, "stats_bootstrap_ci")
    assert "partial_count" in plan or "partial_sum" in plan, plan
    for m in _re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "lang" in m.group(1), m.group(0)


def test_zonemap_audit_single_scan_no_join(spark):
    """dq_zonemap_pruning_audit: one lineitem scan, combinable block
    aggregate, 3-row rollup — no join, no window."""
    plan = _plan(spark, "dq_zonemap_pruning_audit")
    assert plan.count("FileScan parquet") == 1, plan
    assert "Join" not in plan and "windowspecdefinition" not in plan, plan


def test_zorder_gain_broadcasts_stats_no_collect_shape(spark):
    """dq_zorder_pruning_gain: normalization scalars must arrive by
    broadcast join (a 1-row stats aggregate), never a second-pass literal;
    block aggregates must combine map-side."""
    plan = _plan(spark, "dq_zorder_pruning_gain")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert "partial_count" in plan, plan
    assert "windowspecdefinition" not in plan, plan


def test_state_estimate_no_unpartitioned_grid_window(spark):
    """stream_state_size_estimate: the minute-grid cumulative must run
    pid-partitioned; no window may order by the minute without a
    partition key."""
    import re as _re

    plan = _plan(spark, "stream_state_size_estimate")
    assert "windowspecdefinition(__pid#" in plan, plan
    bad = _re.findall(r"windowspecdefinition\(m#\d+ ASC", plan)
    assert not bad, (bad, plan)


def test_interleave_prunes_rank_before_shuffle(spark):
    """corpus_interleave_schedule: the explicit r <= 40 bound must arm a
    partial WindowGroupLimit; the source-index table must broadcast."""
    plan = _plan(spark, "corpus_interleave_schedule")
    assert "WindowGroupLimit" in plan and "Partial" in plan, plan
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan, plan


def test_truncated_recall_broadcasts_queries_both_passes(spark):
    """sim_truncated_dim_recall: both ranking passes must broadcast the
    query block; no cartesian fallback."""
    plan = _plan(spark, "sim_truncated_dim_recall")
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") + plan.count("BroadcastHashJoin") >= 2, plan


# ---------------------------------------------------------------------------
# Round-7 additions
# ---------------------------------------------------------------------------


def test_temporal_holdout_windows_partition_by_user(spark):
    """split_temporal_holdout: the rank and per-user count must ride
    user-partitioned windows; nothing may window over the whole event
    table."""
    import re as _re

    plan = _plan(spark, "split_temporal_holdout")
    specs = _re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    for s in specs:
        assert "user_id" in s, (s, plan)


def test_watermark_lateness_single_scan_partitioned_window(spark):
    """events_watermark_lateness: one events scan; the running max
    partitions by user; the threshold counts combine map-side."""
    import re as _re

    plan = _plan(spark, "events_watermark_lateness")
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_count" in plan or "partial_sum" in plan, plan
    for s in _re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "user_id" in s, (s, plan)


def test_ab_test_no_windows_combinable_aggs(spark):
    """stats_ab_test_proportions: one events scan, two combinable
    aggregates, zero windows — the whole statistic folds map-side."""
    plan = _plan(spark, "stats_ab_test_proportions")
    assert plan.count("FileScan parquet") == 1, plan
    assert "windowspecdefinition" not in plan, plan
    assert "partial_sum" in plan or "partial_count" in plan, plan
    assert "Join" not in plan, plan


def test_calibration_bins_single_scan_grid_windows(spark):
    """quality_calibration_bins: one documents scan and a combinable bin
    aggregate; the base-rate windows run on the bin grid AFTER the
    aggregate (no window may reference doc-level columns)."""
    import re as _re

    plan = _plan(spark, "quality_calibration_bins")
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_count" in plan or "partial_sum" in plan, plan
    for s in _re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "is_en" not in s and "text" not in s, (s, plan)


def test_hazard_churn_single_scan_grid_suffix_sum(spark):
    """events_hazard_churn: one events scan, a combinable per-user
    min/max aggregate, then the suffix sum on the bounded week grid."""
    plan = _plan(spark, "events_hazard_churn")
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_min" in plan and "partial_max" in plan, plan


def test_quota_waterfill_single_scan_combinable_demand(spark):
    """corpus_quota_waterfill: one documents scan; the per-source demand
    aggregate combines map-side; every window runs on the source grid
    (no window may reference doc-level columns)."""
    import re as _re

    plan = _plan(spark, "corpus_quota_waterfill")
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_sum" in plan, plan
    for s in _re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "n_chars" not in s and "doc_id" not in s, (s, plan)


def test_negative_sampling_broadcast_shelves_keyed_antijoin(spark):
    """rec_negative_sampling: the 64-row shelf table must broadcast; the
    seen-pairs anti-join must stay a hash join (no nested-loop fallback);
    the rank window partitions by customer."""
    import re as _re

    plan = _plan(spark, "rec_negative_sampling")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "LeftAnti" in plan, plan
    for s in _re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "c_custkey" in s, (s, plan)


def test_knn_mutual_gemm_tiles_no_cartesian(spark):
    """sim_knn_mutual_stats: the pair scorer must be the blocked-GEMM
    applyInPandas tiles (FlatMapGroupsInPandas), never a cartesian or
    per-pair expression cross join; the top-5 window partitions by
    query."""
    plan = _plan(spark, "sim_knn_mutual_stats")
    assert "CartesianProduct" not in plan, plan
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "windowspecdefinition(query_id#" in plan, plan


def test_dsir_broadcast_lm_take_ordered(spark):
    """curation_dsir_importance: the 512-row LM ratio table must
    broadcast to the token stream (the corpus is never shuffled by
    bucket) and the top-20 must plan as TakeOrderedAndProject."""
    plan = _plan(spark, "curation_dsir_importance")
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "partial_count" in plan or "partial_sum" in plan, plan


def test_cohort_ltv_grid_window_broadcast_size(spark):
    """orders_cohort_ltv: the cumulative window partitions by cohort (the
    bounded month grid) and the cohort-size table arrives by broadcast."""
    import re as _re

    plan = _plan(spark, "orders_cohort_ltv")
    assert "BroadcastHashJoin" in plan, plan
    for s in _re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "cohort_ym" in s, (s, plan)


def test_neyman_single_scan_grid_windows(spark):
    """sample_neyman_allocation: one documents scan, combinable stratum
    aggregate (128-bit sums), every window on the strata grid (no window
    may reference doc-level columns)."""
    import re as _re

    plan = _plan(spark, "sample_neyman_allocation")
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_sum" in plan, plan
    for s in _re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "n_chars" not in s and "doc_id" not in s, (s, plan)


def test_group_by_all_plain_combinable_agg(spark):
    """sql_group_by_all: the sugar must desugar to one combinable
    aggregate — single scan, partial aggregation, no window, no join."""
    plan = _plan(spark, "sql_group_by_all")
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_count" in plan or "partial_sum" in plan, plan
    assert "windowspecdefinition" not in plan and "Join" not in plan, plan


def test_affected_partitions_single_scan_no_join(spark):
    """etl_affected_partitions: one events scan, one combinable
    conditional aggregate — no join, no window."""
    plan = _plan(spark, "etl_affected_partitions")
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_sum" in plan, plan
    assert "Join" not in plan and "windowspecdefinition" not in plan, plan


def test_lookalike_take_ordered_broadcast_proto(spark):
    """events_lookalike_rank: the prototype is a 1-row broadcast; the
    top-20 plans as TakeOrderedAndProject (the rank window then runs on
    the bounded 20-row result)."""
    plan = _plan(spark, "events_lookalike_rank")
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_partition_checksums_single_scan_combinable(spark):
    """dq_partition_checksums: one scan, map-side partial sums, no join,
    no window — the checksum must fold like any other aggregate."""
    plan = _plan(spark, "dq_partition_checksums")
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_sum" in plan, plan
    assert "Join" not in plan and "windowspecdefinition" not in plan, plan


def test_anneal_schedule_epoch_windows_broadcast_epochs(spark):
    """corpus_anneal_schedule: every allocation window partitions by
    epoch (the bounded grid); the 3-row epoch table broadcasts."""
    import re as _re

    plan = _plan(spark, "corpus_anneal_schedule")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    specs = _re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    for s in specs:
        assert "epoch" in s, (s, plan)


def test_canonical_failover_single_scan_no_join(spark):
    """dedup_canonical_failover: one scan, one combinable cluster-keyed
    aggregate — the deletion set is scan-side, never a join."""
    plan = _plan(spark, "dedup_canonical_failover")
    assert plan.count("FileScan parquet") == 1, plan
    assert "Join" not in plan and "windowspecdefinition" not in plan, plan


def test_filtered_aggregates_single_scan_no_window(spark):
    """sql_filtered_aggregates: FILTER-clause aggregates desugar to one
    scan with partial aggregation (the distinct adds an expand, not a
    second scan) and no window."""
    plan = _plan(spark, "sql_filtered_aggregates")
    assert plan.count("FileScan parquet") == 1, plan
    assert "windowspecdefinition" not in plan, plan
    assert "partial_count" in plan or "partial_sum" in plan, plan


def test_pk_audit_one_scan_per_table_no_join(spark):
    """dq_primary_key_audit: ten tables scan once each into a unioned
    report — no join anywhere."""
    plan = _plan(spark, "dq_primary_key_audit")
    assert plan.count("FileScan parquet") == 10, plan
    assert "Join" not in plan, plan


def test_sim_histogram_keyed_join_no_allpairs(spark):
    """embed_sim_histogram: the consecutive-id pairing must be a keyed
    equi-join (broadcast or co-keyed), never a cartesian/all-pairs."""
    plan = _plan(spark, "embed_sim_histogram")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert (
        "BroadcastHashJoin" in plan
        or "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
    ), plan


def test_interarrival_lag_window_partitions_by_user(spark):
    """events_interarrival_stats: the lag window partitions by user; the
    only other window is the share fold on the bounded bucket grid."""
    import re as _re

    plan = _plan(spark, "events_interarrival_stats")
    assert plan.count("FileScan parquet") == 1, plan
    specs = _re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert any("user_id" in s for s in specs), (specs, plan)
    for s in specs:
        assert "gap_us" not in s and "event_id" not in s or "user_id" in s, (
            s,
            plan,
        )


def test_trending_decay_broadcast_ref_combinable(spark):
    """events_trending_decay: the reference date is a 1-row broadcast and
    the decay score folds map-side."""
    plan = _plan(spark, "events_trending_decay")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert "partial_sum" in plan, plan


def test_ipw_single_scan_grid_windows(spark):
    """sample_inverse_propensity_weights: one scan, combinable stratum
    aggregate, totals windows on the strata grid only."""
    import re as _re

    plan = _plan(spark, "sample_inverse_propensity_weights")
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_sum" in plan or "partial_count" in plan, plan
    for s in _re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "n_chars" not in s and "doc_id" not in s, (s, plan)


def test_vocab_growth_one_token_shuffle_grid_cumsum(spark):
    """text_vocab_growth_heaps: the only corpus-sized shuffle is the
    token min-aggregate; the checkpoint width broadcasts; the cumulative
    windows order by the bounded bucket grid, never doc_id or tokens."""
    import re as _re

    plan = _plan(spark, "text_vocab_growth_heaps")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert "partial_min" in plan, plan
    for s in _re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "doc_id" not in s and "first_doc" not in s, (s, plan)


def test_abc_classification_pid_cumulative_no_global_sort(spark):
    """parts_abc_classification: the revenue cumulative must run through
    the pid-window rewrite; any window ordering by the (-rev, part)
    struct must be pid-partitioned; no global sort of the part relation
    before the rollup."""
    import re as _re

    plan = _plan(spark, "parts_abc_classification")
    assert "windowspecdefinition(__pid#" in plan, plan
    for s in _re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        if "__ord" in s:
            assert "__pid" in s, (s, plan)


def test_langid_confusion_single_scan_combinable(spark):
    """text_langid_confusion: scan-side prediction, one combinable
    aggregate, no join, no window."""
    plan = _plan(spark, "text_langid_confusion")
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_count" in plan, plan
    assert "Join" not in plan and "windowspecdefinition" not in plan, plan


def test_named_window_single_operator(spark):
    """sql_named_window_clause: the shared named window must compile to
    ONE Window operator computing both functions (sharing the spec is
    what buys this; two inline specs could plan two operators)."""
    plan = _plan(spark, "sql_named_window_clause")
    # both functions in one Window operator: row_number and sum appear in
    # the same Window line
    win_lines = [
        line for line in plan.splitlines() if "row_number()" in line and "sum(" in line
    ]
    assert win_lines, plan
    assert "windowspecdefinition(o_custkey#" in plan, plan


def test_partition_gini_grid_windows_single_scan(spark):
    """lake_partition_size_gini: one scan, combinable manifest aggregate,
    rank/total windows on the bounded manifest grid only."""
    import re as _re

    plan = _plan(spark, "lake_partition_size_gini")
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_sum" in plan, plan
    for s in _re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "n_chars" not in s and "doc_id" not in s, (s, plan)


def test_ks_two_sample_pid_cumulative_no_global_sort(spark):
    """stats_ks_two_sample: both sample CDFs must ride the pid-window
    rewrite — every window touching the value grid is pid-partitioned;
    the final reduction is a combinable max."""
    import re as _re

    plan = _plan(spark, "stats_ks_two_sample")
    assert "windowspecdefinition(__pid#" in plan, plan
    for s in _re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        if "v#" in s:
            assert "__pid" in s, (s, plan)
    assert "partial_max" in plan, plan


def test_mann_whitney_pid_cumulative_no_global_sort(spark):
    """stats_mann_whitney_u: the pooled rank cumulative must be
    pid-partitioned (no unpartitioned window over the value grid); the
    statistic reduces via a combinable sum."""
    import re as _re

    plan = _plan(spark, "stats_mann_whitney_u")
    assert "windowspecdefinition(__pid#" in plan, plan
    for s in _re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        if "v#" in s:
            assert "__pid" in s, (s, plan)
    assert "partial_sum" in plan, plan


def test_chi2_independence_single_scan_combinable(spark):
    """stats_chi2_independence: one events scan, a combinable contingency
    aggregate; marginal windows run on the aggregated grid (no raw
    event column inside any window spec)."""
    import re as _re

    plan = _plan(spark, "stats_chi2_independence")
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_count" in plan, plan
    for s in _re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "ts#" not in s and "user_id" not in s, (s, plan)


def test_stump_split_pid_cumulative_no_global_sort(spark):
    """stats_stump_split_gini: both label cumulatives over the threshold
    grid must be pid-partitioned — the histogram-based split finder
    never globally sorts."""
    import re as _re

    plan = _plan(spark, "stats_stump_split_gini")
    assert "windowspecdefinition(__pid#" in plan, plan
    for s in _re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        if "thr_e2#" in s:
            assert "__pid" in s, (s, plan)


def test_pareto_frontier_pid_suffix_max_no_quadratic(spark):
    """curation_pareto_frontier: the suffix maximum must be
    pid-partitioned (no unpartitioned window over the x grid) and the
    plan must contain nothing quadratic — the skyline is sort-based,
    not nested-loop."""
    import re as _re

    plan = _plan(spark, "curation_pareto_frontier")
    assert "windowspecdefinition(__pid#" in plan, plan
    for s in _re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        if "__negx#" in s:
            assert "__pid" in s, (s, plan)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "partial_max" in plan, plan


def test_weekly_stickiness_single_scan_no_window(spark):
    """events_weekly_stickiness: one events scan, the pair dedup and
    week rollup are combinable aggregates — no join, no window."""
    plan = _plan(spark, "events_weekly_stickiness")
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_count" in plan, plan
    assert "Join" not in plan and "windowspecdefinition" not in plan, plan


def test_time_to_convert_keyed_join_no_window(spark):
    """events_time_to_convert: user-keyed combinable min-aggregates and
    an equi-join — no window, nothing quadratic."""
    plan = _plan(spark, "events_time_to_convert")
    assert "partial_min" in plan, plan
    assert "windowspecdefinition" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_bitmap_distinct_partial_bitor(spark):
    """agg_bitmap_distinct: the word bitmaps must pre-OR map-side
    (partial_bit_or) — that partial combine IS the shuffle-volume win
    the operator exists for; popcount sums are partial too."""
    plan = _plan(spark, "agg_bitmap_distinct")
    assert "partial_bit_or" in plan, plan
    assert "partial_sum" in plan, plan
    assert "windowspecdefinition" not in plan, plan


def test_theil_sen_bounded_pair_join(spark):
    """stats_theil_sen_slope: the pairwise join must run on the
    aggregated (nation, year) grid — partial_sum proves the data-sized
    aggregate combines map-side; ranking windows are nation-partitioned."""
    import re as _re

    plan = _plan(spark, "stats_theil_sen_slope")
    assert "partial_sum" in plan, plan
    assert "CartesianProduct" not in plan, plan
    for s in _re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "nk#" in s, (s, plan)


def test_runs_test_bounded_grid_windows(spark):
    """stats_runs_test: ranking/lag windows run on the per-day aggregate
    only (no raw orders column in any spec); the day rollup combines
    map-side."""
    import re as _re

    plan = _plan(spark, "stats_runs_test")
    assert "partial_count" in plan, plan
    for s in _re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "o_orderkey" not in s and "o_custkey" not in s, (s, plan)


def test_hill_take_ordered_no_global_sort(spark):
    """corpus_tail_index_hill: the top-101 selection must plan as
    TakeOrderedAndProject (per-partition heaps, no full sort); the
    ranking window runs on the bounded slice after the limit."""
    plan = _plan(spark, "corpus_tail_index_hill")
    assert "TakeOrderedAndProject" in plan, plan
    assert "GlobalLimit" not in plan or "TakeOrderedAndProject" in plan, plan


def test_intra_label_diversity_no_pair_join(spark):
    """embed_intra_label_diversity: the centroid identity must remove
    the quadratic pair join — combinable sums only, no window, nothing
    quadratic, and the only join is the label-keyed recombination."""
    plan = _plan(spark, "embed_intra_label_diversity")
    assert "partial_sum" in plan, plan
    assert "windowspecdefinition" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_pivot_unpivot_combinable_single_scan(spark):
    """sql_pivot_unpivot_roundtrip: the PIVOT aggregate must combine
    map-side (partial_pivotfirst) over a single scan; UNPIVOT expands
    the bounded wide grid (Expand), never raw data."""
    plan = _plan(spark, "sql_pivot_unpivot_roundtrip")
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_pivotfirst" in plan, plan
    assert "Expand" in plan, plan
    assert "Join" not in plan, plan


def test_cohens_kappa_single_scan_no_join(spark):
    """stats_cohens_kappa: both raters evaluate scan-side into ONE
    combinable aggregate — no join, no window, one scan."""
    plan = _plan(spark, "stats_cohens_kappa")
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_count" in plan, plan
    assert "Join" not in plan and "windowspecdefinition" not in plan, plan


def test_sequence_motifs_user_window_topk(spark):
    """events_sequence_motifs: the only window is user-partitioned (the
    sessionization key); the top-20 plans as TakeOrderedAndProject."""
    import re as _re

    plan = _plan(spark, "events_sequence_motifs")
    for s in _re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "user_id#" in s, (s, plan)
    assert "TakeOrderedAndProject" in plan, plan


def test_otif_rate_keyed_join_combinable(spark):
    """orders_otif_rate: order-keyed join + combinable conjunction
    aggregate; no window, nothing quadratic."""
    plan = _plan(spark, "orders_otif_rate")
    assert "partial_sum" in plan, plan
    assert "windowspecdefinition" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_class_balanced_no_class_sort(spark):
    """sample_class_balanced: every window is class-partitioned (the
    prefix-grid cumulative and the boundary-slice row_number — never an
    unpartitioned or non-class window); the boundary join broadcasts;
    the grid aggregate combines map-side."""
    import re as _re

    plan = _plan(spark, "sample_class_balanced")
    assert "partial_count" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    specs = _re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    for s in specs:
        assert "lang#" in s, (s, plan)


def test_filter_waterfall_single_scan_one_agg(spark):
    """corpus_filter_waterfall: all gates evaluate scan-side into ONE
    combinable aggregate — single scan, no join, no window; the 4-row
    unpivot generates from the aggregate row."""
    plan = _plan(spark, "corpus_filter_waterfall")
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_sum" in plan, plan
    assert "Join" not in plan and "windowspecdefinition" not in plan, plan
    assert "Generate" in plan, plan


def test_customers_gini_pid_cumulative(spark):
    """customers_revenue_gini: the value-grid cumulative must ride the
    pid-window rewrite (revenue grid is unbounded — no unpartitioned
    window over it); both aggregates combine map-side."""
    import re as _re

    plan = _plan(spark, "customers_revenue_gini")
    assert "windowspecdefinition(__pid#" in plan, plan
    for s in _re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        if "v#" in s:
            assert "__pid" in s, (s, plan)
    assert "partial_sum" in plan, plan


def test_autocorr_bounded_grid_lead(spark):
    """stats_autocorr_lag1: the lead window runs on the per-day
    aggregate only (no raw order column in any spec); totals broadcast."""
    import re as _re

    plan = _plan(spark, "stats_autocorr_lag1")
    assert "partial_count" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    for s in _re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "o_custkey" not in s and "o_orderkey" not in s, (s, plan)


def test_segment_transitions_customer_window(spark):
    """customers_segment_transitions: the only window partitions by
    customer (each partition ≤ |years| rows); the yearly aggregate
    combines map-side; the rollup is bounded."""
    import re as _re

    plan = _plan(spark, "customers_segment_transitions")
    assert "partial_sum" in plan, plan
    specs = _re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    for s in specs:
        assert "o_custkey#" in s, (s, plan)


def test_spearman_pid_rank_grids(spark):
    """stats_spearman_rho: both rank grids must ride the pid-window
    rewrite (no unpartitioned window over either unbounded value grid);
    the reduction combines map-side."""
    import re as _re

    plan = _plan(spark, "stats_spearman_rho")
    assert "windowspecdefinition(__pid#" in plan, plan
    for s in _re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "__pid" in s, (s, plan)
    assert "partial_sum" in plan, plan


def test_cusum_bounded_grid_walk(spark):
    """stats_cusum_changepoint: the cumulative walk's only window runs
    on the per-day aggregate (no raw order column in any spec); the
    daily count combines map-side; the totals broadcast."""
    import re as _re

    plan = _plan(spark, "stats_cusum_changepoint")
    assert "partial_count" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    for s in _re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "o_custkey" not in s and "o_orderkey" not in s, (s, plan)


def test_poisson_dispersion_two_aggs_no_window_no_join(spark):
    """stats_poisson_dispersion: one events scan into two combinable
    aggregates — no window, no join anywhere in the plan."""
    plan = _plan(spark, "stats_poisson_dispersion")
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_count" in plan, plan
    assert "Join" not in plan and "windowspecdefinition" not in plan, plan


def test_simpson_diversity_two_aggs_no_window_no_join(spark):
    """corpus_simpson_diversity: one documents scan into two combinable
    aggregates over the bounded source×lang grid — no window, no join;
    the scan prunes to (source, lang)."""
    plan = _plan(spark, "corpus_simpson_diversity")
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_count" in plan, plan
    assert "Join" not in plan and "windowspecdefinition" not in plan, plan
    assert "text#" not in plan.split("ReadSchema")[-1], plan


def test_kruskal_wallis_pid_window_only(spark):
    """stats_kruskal_wallis: the pooled cents-grid cumulative must ride
    the pid-window rewrite; no unpartitioned window may order by the
    data-sized value grid, and nothing may go cartesian."""
    import re as _re

    plan = _plan(spark, "stats_kruskal_wallis")
    assert "windowspecdefinition(__pid#" in plan, plan
    bad = _re.findall(r"windowspecdefinition\(v#\d+L? ASC", plan)
    assert not bad, (bad, plan)
    assert "CartesianProduct" not in plan, plan


def test_wilson_ci_single_scan_no_window_no_join(spark):
    """stats_wilson_ci: one combinable aggregate on one documents scan;
    the bounded-grid arithmetic must introduce no window and no join."""
    plan = _plan(spark, "stats_wilson_ci")
    assert plan.count("Scan parquet") == 1, plan
    assert "windowspecdefinition" not in plan, plan
    assert "Join" not in plan, plan
    assert "partial_count" in plan, plan


def test_tukey_fences_broadcast_back(spark):
    """dq_tukey_outliers: the quartile window must partition by segment
    (never unpartitioned), and the 5-row fence table must broadcast onto
    the counting scan."""
    import re as _re

    plan = _plan(spark, "dq_tukey_outliers")
    assert "BroadcastHashJoin" in plan, plan
    assert "windowspecdefinition(seg#" in plan, plan
    # every window spec carries the segment partition key
    specs = _re.findall(r"windowspecdefinition\([^)]*\)", plan)
    assert specs and all("seg#" in s for s in specs), specs


def test_bpe_pair_counts_heap_topk(spark):
    """tokenize_bpe_pair_counts: the top-30 must plan as
    TakeOrderedAndProject (per-partition heaps), never a global Sort,
    and both aggregates must map-side combine."""
    plan = _plan(spark, "tokenize_bpe_pair_counts")
    assert "TakeOrderedAndProject" in plan, plan
    assert "partial_count" in plan and "partial_sum" in plan, plan


def test_audience_overlap_cokeyed_join(spark):
    """events_audience_overlap: the intersection must come from a
    user-keyed equi-join (hash or sort-merge), never a nested-loop or
    cartesian pairing of the type sets; the size table broadcasts."""
    plan = _plan(spark, "events_audience_overlap")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "HashAggregate" in plan, plan


def test_systematic_sample_pid_window_only(spark):
    """sample_systematic: the global position must be the pid-window
    rewrite over the md5-rank struct; no unpartitioned window may order
    by the rank key."""
    import re as _re

    plan = _plan(spark, "sample_systematic")
    assert "windowspecdefinition(__pid#" in plan, plan
    bad = _re.findall(r"windowspecdefinition\(__key#\d+ ASC", plan)
    assert not bad, (bad, plan)


def test_distinct_on_rewrite_window_group_limit(spark):
    """sql_distinct_on_rewrite: the rank-1 filter must plan as
    WindowGroupLimit so per-customer pruning happens before the
    exchange."""
    plan = _plan(spark, "sql_distinct_on_rewrite")
    assert "WindowGroupLimit" in plan, plan
    assert "windowspecdefinition(o_custkey#" in plan, plan


def test_pq_distortion_broadcast_codebook_no_pairs(spark):
    """embed_pq_distortion: the 512-row codebook must broadcast onto the
    exploded component stream; the distance aggregate must map-side
    combine; nothing may plan as a nested-loop/cartesian pairing."""
    plan = _plan(spark, "embed_pq_distortion")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "partial_sum" in plan, plan


def test_benjamini_hochberg_bounded_windows_only(spark):
    """stats_benjamini_hochberg: the only unpartitioned windows (rank,
    k_max) must run AFTER the per-type aggregate — no window spec may
    reference user_id; the arm join stays user-keyed."""
    import re as _re

    plan = _plan(spark, "stats_benjamini_hochberg")
    bad = _re.findall(r"windowspecdefinition\([^)]*user_id#[^)]*\)", plan)
    assert not bad, (bad, plan)
    assert "CartesianProduct" not in plan, plan


def test_ivf_probe_curve_equijoin_buckets(spark):
    """sim_ivf_probe_curve: candidate scoring must be an equi-join on
    the centroid id (the inverted file) for every probe setting — three
    cid-keyed joins, never an unkeyed corpus x corpus pairing. The
    BroadcastNestedLoopJoin Cross nodes in this plan are the certified
    bounded broadcasts (capped query slice x centroid table / corpus
    scan) from cosine_topk/ivf_topk; CartesianProduct (shuffled
    unbounded pairing) stays forbidden."""
    import re as _re

    plan = _plan(spark, "sim_ivf_probe_curve")
    assert "CartesianProduct" not in plan, plan
    cid_joins = _re.findall(
        r"(?:SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin) \[cid#", plan
    )
    assert len(cid_joins) >= 3, (cid_joins, plan)


def test_backlog_aging_pushdown_and_broadcast(spark):
    """orders_backlog_aging: the status predicate must push to the
    parquet scan, the 1-row reference date must broadcast, and the
    rollup must map-side combine — no window, no data-sized join."""
    plan = _plan(spark, "orders_backlog_aging")
    assert _pushed_nonempty(plan) >= 1, plan
    assert "windowspecdefinition" not in plan, plan
    assert "partial_count" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_kendall_tau_bounded_pairwise_only(spark):
    """stats_kendall_tau: the pairwise comparison must run on the
    bounded per-nation aggregate (broadcast inequality join), with the
    dims broadcast into the orders scan — never a raw-row pairing."""
    plan = _plan(spark, "stats_kendall_tau")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "CartesianProduct" not in plan, plan
    assert "windowspecdefinition" not in plan, plan


def test_user_rate_ladder_single_scan(spark):
    """events_user_rate_ladder: one events scan, combinable per-user
    aggregate, scan-side bucketing, bounded rollup — no window, no
    join."""
    plan = _plan(spark, "events_user_rate_ladder")
    assert plan.count("Scan parquet") == 1, plan
    assert "windowspecdefinition" not in plan, plan
    assert "Join" not in plan, plan
    assert "partial_count" in plan, plan


def test_eval_protocol_pid_window_and_text_pruned(spark):
    """pipeline_eval_protocol: the split position must be the pid-window
    rewrite (no unpartitioned window over the rank key), the leak
    fingerprint set must broadcast, and the text column must be dropped
    before any exchange (only the 32-byte fingerprint shuffles)."""
    import re as _re

    plan = _plan(spark, "pipeline_eval_protocol")
    assert "windowspecdefinition(__pid#" in plan, plan
    bad = _re.findall(r"windowspecdefinition\(__key#\d+ ASC", plan)
    assert not bad, (bad, plan)
    assert "BroadcastHashJoin" in plan, plan
    # no Exchange line may carry the raw text column
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text#" not in line, line


def test_limit_offset_heap_topk(spark):
    """sql_limit_offset: pagination must plan as TakeOrderedAndProject
    (per-partition heaps sized offset+limit), never a global Sort."""
    plan = _plan(spark, "sql_limit_offset")
    assert "TakeOrderedAndProject" in plan, plan


def test_randomization_test_combinable_fanout(spark):
    """stats_randomization_test: the 32 re-randomizations must be a
    broadcast fan-out of the filtered scan feeding ONE combinable
    aggregate keyed by the permutation index — no window, no
    data-sized shuffle beyond the 32-row grid, predicate pushed."""
    plan = _plan(spark, "stats_randomization_test")
    assert "windowspecdefinition" not in plan, plan
    assert "partial_sum" in plan, plan
    assert _pushed_nonempty(plan) >= 1, plan
    assert "CartesianProduct" not in plan, plan


def test_cusum_per_type_partitioned_walks(spark):
    """events_cusum_per_type: every window spec must partition by
    event_type — the walk and the argmax are keyed, never global."""
    import re as _re

    plan = _plan(spark, "events_cusum_per_type")
    specs = _re.findall(r"windowspecdefinition\([^)]*\)", plan)
    assert specs and all("event_type#" in s for s in specs), specs
    assert "CartesianProduct" not in plan, plan


def test_attribution_curve_single_user_window(spark):
    """events_attribution_window_curve: the preceding-view time must be
    ONE user-partitioned running window (never a purchases x views
    join); the 4-point dimension broadcasts."""
    import re as _re

    plan = _plan(spark, "events_attribution_window_curve")
    specs = _re.findall(r"windowspecdefinition\([^)]*\)", plan)
    assert specs and all("user_id#" in s for s in specs), specs
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_repeat_rate_broadcast_dim(spark):
    """orders_repeat_rate: the customer dimension must broadcast onto
    the per-customer aggregate; one data-sized shuffle only."""
    plan = _plan(spark, "orders_repeat_rate")
    assert "BroadcastHashJoin" in plan, plan
    assert "windowspecdefinition" not in plan, plan


def test_dims_profile_single_aggregate(spark):
    """embed_dims_profile: posexplode into ONE combinable 64-group
    aggregate — no window, no join."""
    plan = _plan(spark, "embed_dims_profile")
    assert "Generate" in plan, plan
    assert "windowspecdefinition" not in plan, plan
    assert "Join" not in plan, plan
    assert "partial_count" in plan, plan


def test_sign_test_pushdown_keyed_join(spark):
    """stats_sign_test: the year predicate must push to the scan and
    the pairing must be a customer-keyed equi-join — no window, nothing
    cartesian."""
    plan = _plan(spark, "stats_sign_test")
    assert _pushed_nonempty(plan) >= 1, plan
    assert "windowspecdefinition" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_wma_grid_join_only(spark):
    """ts_wma_daily: the smoother must join the bounded DAY GRID to
    itself (with the 7-row offset broadcast), never raw orders; exactly
    one parquet scan feeds both grid sides via reuse or re-aggregation —
    no window over raw rows."""
    plan = _plan(spark, "ts_wma_daily")
    assert "windowspecdefinition" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan


def test_id_continuity_pid_window_only(spark):
    """dq_id_continuity: the dense rank must be the pid-window rewrite
    (no unpartitioned window over the id column) and the status
    predicate must push to the scan."""
    import re as _re

    plan = _plan(spark, "dq_id_continuity")
    assert "windowspecdefinition(__pid#" in plan, plan
    bad = _re.findall(r"windowspecdefinition\(id#\d+L? ASC", plan)
    assert not bad, (bad, plan)
    assert _pushed_nonempty(plan) >= 1, plan


def test_source_hapax_token_keyed_join(spark):
    """corpus_source_hapax_share: the hapax flag must join back
    token-keyed (SMJ/SHJ/BHJ on the token), never a nested-loop; both
    aggregates map-side combine."""
    plan = _plan(spark, "corpus_source_hapax_share")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "partial_count" in plan, plan


def test_word_length_profile_bounded_grid_window(spark):
    """text_word_length_profile: the only window runs over the bounded
    word-length grid AFTER the combinable aggregate — no window spec
    may reference the raw token column."""
    import re as _re

    plan = _plan(spark, "text_word_length_profile")
    bad = _re.findall(r"windowspecdefinition\([^)]*\bw#[^)]*\)", plan)
    assert not bad, (bad, plan)
    assert "partial_count" in plan, plan


def test_pq_codebook_train_no_join_assignment(spark):
    """embed_pq_codebook_train: the trained assignment must be a pure
    literal-indexed projection — the m*k*8 codebook rides in the plan,
    so the final rollup reads the persisted (id, s, code, d2) frame and
    aggregates with map-side combine; no join of any kind, no window."""
    plan = _plan(spark, "embed_pq_codebook_train")
    assert "Join" not in plan, plan
    assert "InMemoryTableScan" in plan, plan
    assert "partial_count" in plan, plan
    assert "windowspecdefinition" not in plan, plan


def test_ann_serving_equijoin_candidates_no_cartesian(spark):
    """pipeline_ann_serving: candidate generation must ride the inverted
    file (equi-join on cid), ADC scoring on (neighbor_id)/(s, code) with
    the codebook and capped query slices broadcast. The
    BroadcastNestedLoopJoin nodes are the certified bounded broadcasts
    (probe dim x capped pr; corpus x 10-query slice; 1-row totals);
    CartesianProduct (shuffled unbounded pairing) stays forbidden."""
    plan = _plan(spark, "pipeline_ann_serving")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_pq_residual_gain_coarse_broadcast_no_cartesian(spark):
    """embed_pq_residual_gain: the coarse residual pass must broadcast
    the centroid slice (bounded |corpus|/100 rows) and window per-vector;
    both trainings stay literal-indexed projections, so the final 8-row
    comparison reads two persisted assignment frames — no
    CartesianProduct anywhere, and every window spec is vec_id-keyed."""
    import re as _re

    plan = _plan(spark, "embed_pq_residual_gain")
    assert "CartesianProduct" not in plan, plan
    assert "InMemoryTableScan" in plan, plan
    bad = [
        w
        for w in _re.findall(r"windowspecdefinition\([^)]*\)", plan)
        if "vec_id#" not in w
    ]
    assert not bad, (bad, plan)


def test_ann_rerank_stage2_broadcast_shortlist(spark):
    """pipeline_ann_rerank: stage 2 must join the BROADCAST shortlist
    (|queries| x |shortlist| rows) against the exact-distance frame —
    never a second corpus-wide pairing; candidate generation stays a cid
    equi-join; CartesianProduct forbidden (the BNLJ nodes are the
    certified bounded broadcasts: centroid slice, 10-query slice, 1-row
    totals, 2-row stage grid)."""
    plan = _plan(spark, "pipeline_ann_rerank")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_bpe_merge_trajectory_vocab_scans_only(spark):
    """tokenize_bpe_merge_trajectory: no join anywhere (merges are
    literal replaces), no Python, and — since the r11 persist adoption —
    the returned plan reads the MATERIALIZED ≤3-row merge table
    (InMemoryTableScan) rather than re-running the training chain; the
    per-iteration argmax heap shape is pinned at the operator level by
    test_bpe_train_argmax_plans_as_heap."""
    plan = _plan(spark, "tokenize_bpe_merge_trajectory")
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "InMemoryTableScan" in plan, plan


def test_bpe_train_argmax_plans_as_heap(spark):
    """operators/packing.py::bpe_train: each iteration's merge-rule
    argmax must plan as TakeOrderedAndProject (per-partition heap,
    never a global sort) over a map-side-combinable pair count, with
    the merge applied as a literal replace (no join anywhere). Pinned
    on the operator's own pre-materialization merge-table plan — the
    registry queries now materialize their bounded outputs, so the
    training shape is no longer visible in THEIR returned plans."""
    from dend_spark_data_lake_spark.operators.packing import bpe_train

    v = spark.createDataFrame(
        [("abab", 4), ("ab", 3), ("ba", 2)], "w string, f long"
    )
    mt, _stages = bpe_train(v, merges=1)
    plan = mt._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "Join" not in plan, plan
    assert "partial_sum" in plan, plan


def test_bpe_compression_vocab_rollups_no_join(spark):
    """tokenize_bpe_compression: no join anywhere (merges are literal
    replaces), no Python, and — since the r11 persist adoption — the
    returned plan reads the MATERIALIZED bounded 4-row stage grid
    (InMemoryTableScan) rather than re-deriving vocabulary rollups from
    the corpus."""
    plan = _plan(spark, "tokenize_bpe_compression")
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "InMemoryTableScan" in plan, plan


def test_pq_bits_tradeoff_no_join_three_trainings(spark):
    """embed_pq_bits_tradeoff: three literal-indexed trainings, three
    persisted assignment reads, three 1-row aggregates, one union —
    no join of any kind in the final plan."""
    plan = _plan(spark, "embed_pq_bits_tradeoff")
    assert "Join" not in plan, plan
    assert plan.count("InMemoryTableScan") >= 3, plan


def test_ann_index_maintenance_broadcast_centroids(spark):
    """ann_index_maintenance: the corpus must be read once with the
    centroid slice broadcast onto it (BNLJ over the bounded slice is the
    certified IVF-assignment shape); the per-list aggregate map-side
    combines; the split predicate is scan-side — no second corpus scan,
    no CartesianProduct."""
    plan = _plan(spark, "ann_index_maintenance")
    assert "CartesianProduct" not in plan, plan
    assert "partial_sum" in plan, plan
    assert plan.count("Scan parquet") <= 2, plan


def _frame_plan(spark, frames_fn) -> str:
    """Plan of a pre-materialization frame builder: the r12 persist
    adoption made the three BPE serving/audit queries return a
    materialized bounded report (InMemoryTableScan), so their inner
    encode shapes are pinned on the builders' lazy frames — same move
    as test_bpe_train_argmax_plans_as_heap. The builder's persisted
    caches are released before returning (planning never runs the
    frame, but bpe_train's argmax collects do populate them)."""
    out, caches = frames_fn(spark, SF_SMOKE)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for c in caches:
        c.unpersist()
    return plan


def test_bpe_encode_word_equijoin_no_python(spark):
    """pipeline_bpe_encode: the encode must be ONE word-keyed EQUI-join
    of the (lang, word) frequency table against the trained final
    vocabulary — never a cartesian pairing, never Python row-at-a-time
    in the hot path — with the per-language report map-side combining
    and the trained merges folded into the plan as literal replaces (no
    per-merge join). The join strategy is deliberately left to Catalyst
    size estimates (broadcast at test SF, shuffle join once the
    vocabulary outgrows the threshold — the query sets no broadcast
    hint), so the lock accepts any hash/merge EQUI-join on the word.
    Pinned on the pre-materialization frame; the registered query's
    returned plan must read the MATERIALIZED one-row-per-language
    report (one-corpus-scan persist adoption, r12 rotation)."""
    import re as _re

    from dend_spark_data_lake_spark.queries import _bpe_encode_frames

    plan = _frame_plan(spark, _bpe_encode_frames)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    word_joins = _re.findall(
        r"(?:BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[w#", plan
    )
    assert word_joins, plan
    assert "partial_sum" in plan, plan
    # the trained merges ride as folded literal replaces, not joins
    assert "replace(" in plan, plan
    # the (lang, word) frequency table is the persisted single scan
    assert "InMemoryTableScan" in plan, plan
    ret = _plan(spark, "pipeline_bpe_encode")
    assert "InMemoryTableScan" in ret, ret


def test_bpe_oov_audit_left_join_pushdown(spark):
    """tokenize_bpe_oov_audit: the batch-side corpus scan must push its
    doc_id % 10 >= 8 slice predicate down to parquet (the train side's
    < 8 filter now lives inside the persisted vocabulary's cached plan
    — r12 persist adoption), the frozen-vocabulary encode must be a
    word-keyed EQUI-join (strategy left to Catalyst sizes), the trained
    merges must ride as folded literal replaces, and the audit
    aggregate must map-side combine — no cartesian, no Python. Pinned
    on the pre-materialization frame; the registered query's returned
    plan must read the MATERIALIZED report."""
    import re as _re

    from dend_spark_data_lake_spark.queries import _bpe_oov_frames

    plan = _frame_plan(spark, _bpe_oov_frames)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    word_joins = _re.findall(
        r"(?:BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[w#", plan
    )
    assert word_joins, plan
    assert "partial_sum" in plan, plan
    assert "replace(" in plan, plan
    # batch slice filter reaches the scan (Filter node + PushedFilters)
    assert plan.count("(doc_id#") >= 2, plan
    # the trained vocabulary rides the persisted single train-side scan
    assert "InMemoryTableScan" in plan, plan
    ret = _plan(spark, "tokenize_bpe_oov_audit")
    assert "InMemoryTableScan" in ret, ret


def test_bpe_budget_no_unpartitioned_doc_window(spark):
    """curation_bpe_token_budget: same machinery locks as
    curation_token_budget plus the encode shape — the only doc-level
    cumulative runs pid-partitioned (global_cumulative_counts);
    unpartitioned windows may only order by the bounded score grid; the
    per-document pricing is a word-keyed EQUI-join with the trained
    merges folded as literal replaces; no cartesian, no Python. Pinned
    on the pre-materialization frame; the registered query's returned
    plan must read the MATERIALIZED report."""
    import re as _re

    from dend_spark_data_lake_spark.queries import _bpe_budget_frames

    plan = _frame_plan(spark, _bpe_budget_frames)
    assert "windowspecdefinition(__pid#" in plan, plan
    bad = _re.findall(r"windowspecdefinition\(doc_id#\d+ ASC", plan)
    assert not bad, (bad, plan)
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    word_joins = _re.findall(
        r"(?:BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[w#", plan
    )
    assert word_joins, plan
    assert "replace(" in plan, plan
    # the training vocabulary rides its persisted single scan
    assert "InMemoryTableScan" in plan, plan
    ret = _plan(spark, "curation_bpe_token_budget")
    assert "InMemoryTableScan" in ret, ret


def test_bpe_rate_distortion_vocab_rollups_no_join(spark):
    """tokenize_bpe_rate_distortion (round 11): no join anywhere in the
    plan (the folded-merge lock — a non-folded merge table could only
    enter via a join, and the prefix-nested trajectory needs no
    per-budget retraining), no Python, and the returned plan reads the
    MATERIALIZED bounded 4-row budget grid (InMemoryTableScan) rather
    than re-deriving vocabulary rollups from the corpus — the persist
    discipline that makes the curve a one-corpus-scan query; the
    baseline attaches via a window over that bounded grid."""
    plan = _plan(spark, "tokenize_bpe_rate_distortion")
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "InMemoryTableScan" in plan, plan
    assert "Window" in plan, plan


def test_bpe_pack_word_equijoin_windowless_fold(spark):
    """pack_sequences_bpe (round 12): the per-document BPE pricing must
    be a word-keyed EQUI-join against the trained vocabulary (strategy
    left to Catalyst sizes) with the merges folded as literal replaces
    and the vocabulary riding its persisted single scan
    (InMemoryTableScan); the packing itself must stay greedy_pack's
    windowless per-shard fold — NO Window node anywhere (the oracle's
    row_number/recursion is replayed inside bounded per-shard arrays),
    no cartesian, no Python. Scan budget: the doc spine + the
    (doc, word) cost branch — a jump past 4 means training leaked its
    per-merge corpus re-scans back into the returned plan."""
    import re as _re

    plan = _plan(spark, "pack_sequences_bpe")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "Window" not in plan, plan
    word_joins = _re.findall(
        r"(?:BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[w#", plan
    )
    assert word_joins, plan
    assert "replace(" in plan, plan
    assert "InMemoryTableScan" in plan, plan
    assert "partial_sum" in plan, plan
    assert plan.count("Scan parquet") <= 4, plan


def test_pack_budget_curve_single_shared_shuffle(spark):
    """pack_budget_curve (round 12): the four greedy folds hash the
    SAME priced frame by the same shard key with a budget-independent
    partial collect, so AQE must materialize ONE shuffle stage and read
    it from every fold branch — the executed final plan's most-repeated
    ShuffleQueryStage id must appear at least 4 times (one per budget).
    Four distinct stage ids for the fold input means the corpus-sized
    side re-shuffled per budget — the 100 TB regression this lock
    exists for. Also: windowless (the recurrence stays inside bounded
    per-shard arrays), word equi-join pricing, folded-merge replaces,
    persisted-vocabulary InMemoryTableScan, no cartesian, no Python;
    the registered query's returned plan reads the materialized 4-row
    curve."""
    import re as _re
    from collections import Counter

    from dend_spark_data_lake_spark.queries import _pack_curve_frames

    out, caches = _pack_curve_frames(spark, SF_SMOKE)
    out.count()  # AQE stage reuse is only visible in the executed plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    for c in caches:
        c.unpersist()
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    word_joins = _re.findall(
        r"(?:BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[w#", plan
    )
    assert word_joins, plan
    assert "replace(" in plan, plan
    assert "InMemoryTableScan" in plan, plan
    # the reuse evidence, robust to AQE plan-string drift (ADVICE r12):
    # either one ShuffleQueryStage id is referenced by all 4 fold
    # branches, or Spark prints the reuse through explicit
    # ReusedExchange/ReusedQueryStage wrapper nodes. Four DISTINCT
    # ids with no reuse marker is the regression this lock exists for.
    stage_refs = Counter(_re.findall(r"ShuffleQueryStage (\d+)", plan))
    reuse_markers = plan.count("ReusedQueryStage") + plan.count(
        "ReusedExchange"
    )
    assert (stage_refs and max(stage_refs.values()) >= 4) or (
        reuse_markers >= 3
    ), (stage_refs, reuse_markers, plan)
    ret = _plan(spark, "pack_budget_curve")
    assert "InMemoryTableScan" in ret, ret


def test_sim_filtered_topk_one_scoring_pass(spark):
    """sim_filtered_topk (round 12): the 10-query batch must broadcast
    onto ONE corpus scoring pass (BroadcastNestedLoopJoin over the
    bounded batch — an unhinted cross join planning CartesianProduct is
    the regression), the global and filtered ranks must both ride
    query_id-PARTITIONED windows (never an unpartitioned corpus sort),
    no Python, and the embeddings table is scanned at most twice (the
    broadcast query slice + the corpus side) — a third scan means the
    global rank re-scored the corpus instead of riding the same pass."""
    import re as _re

    plan = _plan(spark, "sim_filtered_topk")
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    specs = _re.findall(r"windowspecdefinition\(query_id#\d+", plan)
    assert specs, plan
    bad = _re.findall(r"windowspecdefinition\((?:cosine|neighbor_id)#", plan)
    assert not bad, (bad, plan)
    assert plan.count("embeddings.parquet") <= 2, plan


def test_pack_append_bpe_left_join_pricing_windowless_fold(spark):
    """pack_append_bpe (round 13): pricing must be the word-keyed LEFT
    join against the FROZEN standing-slice vocabulary (the OOV rows'
    character fallback is a coalesce on the join output, never a second
    join or a second training), merges folded as literal replaces, the
    vocabulary riding its persisted single scan (InMemoryTableScan);
    the packing stays greedy_pack's windowless per-shard fold — NO
    Window node anywhere, no cartesian, no Python; scan budget <= 4
    (doc spine + the (doc, word) cost branch), pack_sequences_bpe's
    certified budget — a jump past it means the training's per-merge
    corpus re-scans leaked back into the returned plan."""
    import re as _re

    plan = _plan(spark, "pack_append_bpe")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "Window" not in plan, plan
    word_joins = _re.findall(
        r"(?:BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[w#", plan
    )
    assert word_joins, plan
    assert "LeftOuter" in plan, plan
    assert "coalesce" in plan, plan
    assert "replace(" in plan, plan
    assert "InMemoryTableScan" in plan, plan
    assert "partial_sum" in plan, plan
    assert plan.count("Scan parquet") <= 4, plan


def test_l_diversity_single_expand_pass_one_more_aggregate(spark):
    """dq_l_diversity (round 13): the homogeneity audit must keep
    dq_k_anonymity's certified one-pass posture — a single customer
    scan feeding Expand (GROUPING SETS), with count(DISTINCT sens)
    riding the SAME grouping shuffle as a two-phase distinct aggregate
    (one more aggregate, never another scan), then the bounded 3-row
    rollup. A Join, a Window, or a second scan means a per-level (or
    per-measure) recomputation leaked in."""
    plan = _plan(spark, "dq_l_diversity")
    assert "Expand" in plan, plan
    assert plan.count("customer.parquet") == 1, plan
    assert "Join" not in plan and "Window" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "partial_count" in plan, plan


def test_release_ladder_single_pass_checkpoint(spark):
    """dq_release_ladder (round 13): the five-set rollup must be ONE
    corpus pass — a single customer scan feeding a single Expand with
    map-side partial counts — and the returned plan must read ONLY the
    materialized grid (Scan ExistingRDD), never parquet: Catalyst
    prunes grouping sets into each of the seven downstream arms, so a
    lazy rollup re-scans the corpus per arm (measured 7x) — the
    regression this lock exists for."""
    from dend_spark_data_lake_spark.queries import _release_ladder_rollup

    gp = (
        _release_ladder_rollup(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert gp.count("customer.parquet") == 1, gp
    assert gp.count("Expand") == 1, gp
    assert "partial_count" in gp, gp

    plan = _plan(spark, "dq_release_ladder")
    assert plan.count("FileScan parquet") == 0, plan
    assert "Scan ExistingRDD" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_chunk_dedup_tax_two_scans_combinable(spark):
    """curation_chunk_dedup_tax (round 13): exactly two documents
    scans (one per grain branch), hash-keyed combinable aggregates
    (map-side partials), the branches meeting in a 1-row broadcast
    cross join — no window, no Python, no data-sized join."""
    plan = _plan(spark, "curation_chunk_dedup_tax")
    assert plan.count("documents.parquet") == 2, plan
    assert "windowspecdefinition" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "partial_sum" in plan, plan


def test_chunk_windows_single_scan_no_shuffle(spark):
    """text_chunk_windows (round 13): one documents scan, the window
    spine as a bounded Generate (explode), no join, no window
    function, no Python — chunking parallelism IS scan parallelism.
    The only exchange allowed is the presentation ORDER BY's range
    exchange (the registry determinism convention); a second exchange
    means the chunker grew a shuffle."""
    plan = _plan(spark, "text_chunk_windows")
    assert plan.count("documents.parquet") == 1, plan
    assert "Generate" in plan, plan
    assert "Join" not in plan, plan
    assert "windowspecdefinition" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert plan.count("Exchange") <= 1, plan
    assert "CartesianProduct" not in plan, plan


def test_matryoshka_recall_broadcast_sliced_scoring(spark):
    """embed_matryoshka_recall (round 13): each dim's scoring must be
    the certified broadcast-batch pass (BroadcastNestedLoopJoin over
    the bounded query slice — CartesianProduct forbidden) with the
    prefix slice applied scan-side, ranking windows
    query_id-partitioned, no Python, and at most 6 embeddings scans
    (corpus + query slice per dim; the baseline reuses the d=64
    branch)."""
    import re as _re

    plan = _plan(spark, "embed_matryoshka_recall")
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    bad = _re.findall(r"windowspecdefinition\(cosine#", plan)
    assert not bad, (bad, plan)
    assert plan.count("embeddings.parquet") <= 6, plan


def test_t_closeness_one_scan_bounded_spine(spark):
    """dq_t_closeness (round 13): the EMD audit must stay one
    corpus-width pass — a single customer scan feeding Expand (the
    three grouping sets), with the class x band spine built from the
    BOUNDED global marginal (a broadcast onto the class rollup — a
    CartesianProduct over it would mean Spark lost the size estimate)
    and every cumulative window PARTITIONED by class except the
    |bands|-row global marginal's. No Python anywhere."""
    import re as _re

    plan = _plan(spark, "dq_t_closeness")
    assert "Expand" in plan, plan
    assert plan.count("customer.parquet") <= 3, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    specs = _re.findall(r"windowspecdefinition\(gl#\d+", plan)
    assert specs, plan


def test_sim_ivf_filtered_probe_curve_equijoin_buckets(spark):
    """sim_ivf_filtered_probe_curve (round 13): candidate scoring must
    be the (cid, label) equi-join for every probe setting — three
    keyed joins, never an unkeyed corpus pairing; CartesianProduct
    forbidden (the BroadcastNestedLoopJoin Cross nodes are the
    certified bounded broadcasts); no Python."""
    import re as _re

    plan = _plan(spark, "sim_ivf_filtered_probe_curve")
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    cid_label_joins = _re.findall(
        r"(?:SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin) "
        r"\[cid#\d+L?, __ivf_label#",
        plan,
    )
    assert len(cid_label_joins) >= 3, (cid_label_joins, plan)


def test_sim_ivf_filtered_prefilter_equijoin(spark):
    """sim_ivf_filtered (round 13): candidates must come from the
    (cid, label) EQUI-JOIN of the probe list against the label-carrying
    inverted file — the pre-filter intersecting the probe lists before
    any O(dim) dot product. CartesianProduct stays forbidden (the
    BroadcastNestedLoopJoin Cross nodes are the certified bounded
    broadcasts: query slice x centroid table, exact-baseline batch x
    corpus); every ranking window is query_id/neighbor_id-partitioned
    (never an unpartitioned corpus sort); no Python; the embeddings
    table is scanned at most 6x (centroids + inverted file + probe
    slice + the hit-flag baseline's corpus/query sides) — within the
    probe-curve family's budget."""
    import re as _re

    plan = _plan(spark, "sim_ivf_filtered")
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    cid_label_joins = _re.findall(
        r"(?:SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin) "
        r"\[cid#\d+L?, __ivf_label#",
        plan,
    )
    assert cid_label_joins, plan
    bad = _re.findall(r"windowspecdefinition\(cosine#", plan)
    assert not bad, (bad, plan)
    assert plan.count("embeddings.parquet") <= 6, plan


def test_k_anonymity_lattice_single_expand_pass(spark):
    """dq_k_anonymity (round 12): the whole generalization lattice must
    be ONE pass — a single customer scan feeding Spark's Expand
    operator (GROUPING SETS), map-side-combinable partial counts, one
    grouping shuffle, then the bounded 3-row rollup. A Join, a Window,
    or a second scan means a per-level recomputation leaked in —
    the regression that turns an O(1)-pass lattice into O(levels)
    corpus scans."""
    plan = _plan(spark, "dq_k_anonymity")
    assert "Expand" in plan, plan
    assert plan.count("customer.parquet") == 1, plan
    assert "Join" not in plan and "Window" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "partial_count" in plan, plan


def test_pack_append_single_shuffle_fold(spark):
    """pack_sequences_append (round 12): the append must keep
    pack_sequences' exact posture — ONE keyed exchange (groupBy shard)
    with the (is_batch, doc_id)-ordered recurrence folded inside the
    bounded per-shard arrays, weight and batch flag computed scan-side:
    a Window, a Join, or a second Exchange means the incremental append
    leaked a repack or a pack-state handshake into the plan."""
    plan = _plan(spark, "pack_sequences_append")
    assert plan.count("Exchange") == 1, plan
    assert "Window" not in plan and "Join" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_chunk_minhash_banded_equijoin(spark):
    """dedup_chunk_minhash (round 14): candidate generation must be the
    (band, bkey) EQUI-JOIN — the subquadratic LSH bucket join, never an
    all-pairs chunk product; no CartesianProduct anywhere; no Python.
    The chunker side contributes no shuffle of its own (scan + bounded
    explode), so every exchange in the plan belongs to the
    signature/candidate/verify aggregations."""
    import re as _re

    plan = _plan(spark, "dedup_chunk_minhash")
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    band_joins = _re.findall(
        r"(?:SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin) "
        r"\[band#\d+, bkey#",
        plan,
    )
    assert band_joins, plan


def test_chunk_doc_overlap_no_cartesian(spark):
    """dedup_chunk_doc_overlap (round 14): the doc-pair rollup must
    stay keyed — banded candidates, grouped coverage aggregation, two
    keyed joins against the per-doc chunk counts; no CartesianProduct,
    no Python, no window (nothing here needs one)."""
    plan = _plan(spark, "dedup_chunk_doc_overlap")
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "Window" not in plan, plan


def test_chunk_near_tax_bounded_cross(spark):
    """curation_chunk_near_tax (round 14): the only unkeyed join
    allowed is the final 1-row x 1-row report cross (a
    BroadcastNestedLoopJoin over two aggregates); candidates stay the
    banded equi-join; the loser semi-join is keyed on ckey; no
    CartesianProduct, no Python, no window."""
    import re as _re

    plan = _plan(spark, "curation_chunk_near_tax")
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "Window" not in plan, plan
    band_joins = _re.findall(
        r"(?:SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin) "
        r"\[band#\d+, bkey#",
        plan,
    )
    assert band_joins, plan


def test_chunk_clusters_materialized_labels(spark):
    """dedup_chunk_clusters (round 14): the returned plan must read the
    CONVERGED component labels as a materialized RDD (the iterative
    min-label propagation runs at build time, bounded rounds) — zero
    parquet scans, zero joins, no Python in the returned plan; 100 TB
    never materializes a transitive closure lazily."""
    plan = _plan(spark, "dedup_chunk_clusters")
    assert "Scan ExistingRDD" in plan, plan
    assert ".parquet" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_mmr_rerank_grid_only_plan(spark):
    """sim_mmr_rerank (round 14): the greedy selection runs at build
    time over two eagerly-materialized bounded grids (candidates and
    their pairwise similarities) with each step's selection
    checkpointed (lazily the plan embeds step k-1 THREE times — 3^4
    candidate-scan copies by pick 5, measured); the returned plan must
    read ONE materialized grid and touch parquet ZERO times — re-rank
    cost independent of corpus size."""
    plan = _plan(spark, "sim_mmr_rerank")
    assert "Scan ExistingRDD" in plan, plan
    assert ".parquet" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_mmr_lambda_curve_grid_only_plan(spark):
    """sim_mmr_lambda_curve (round 14): all four greedy runs consume
    the SAME two eagerly-materialized bounded grids built once by
    _mmr_candidates; the returned 4-row plan must read only
    materialized grids — parquet ZERO times (sweeping more lambdas
    must not re-cost the corpus), no cartesian, no Python."""
    plan = _plan(spark, "sim_mmr_lambda_curve")
    assert "Scan ExistingRDD" in plan, plan
    assert ".parquet" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_pipeline_chunk_dedup_materialized_labels_plan(spark):
    """pipeline_chunk_dedup (round 14): the connected-components
    labels must arrive materialized (Scan ExistingRDD — the closure
    runs bounded-round at build time, never a lazily-embedded
    transitive closure), the only joins are the label/base equi-join
    and the 1-row x 1-row broadcast cross (no CartesianProduct), and
    the whole report stays JVM-side."""
    plan = _plan(spark, "pipeline_chunk_dedup")
    assert "Scan ExistingRDD" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_sim_ivf_matryoshka_equijoin_buckets(spark):
    """sim_ivf_matryoshka (round 14): all three per-dim index builds
    must generate candidates through the cid equi-join (the inverted
    file), never an unkeyed corpus pairing — the slice composes with
    the bucketing, it does not replace it. The
    BroadcastNestedLoopJoin Cross nodes are the certified bounded
    broadcasts (capped query slice / centroid table); CartesianProduct
    stays forbidden; everything JVM-side."""
    import re as _re

    plan = _plan(spark, "sim_ivf_matryoshka")
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    cid_joins = _re.findall(
        r"(?:SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin) \[cid#", plan
    )
    assert len(cid_joins) >= 3, (cid_joins, plan)


def test_dq_release_emit_checkpoint_and_broadcast_choice(spark):
    """dq_release_emit (round 14): same materialization discipline as
    the ladder — the returned plan reads ONLY the checkpointed class
    grid (Scan ExistingRDD), never parquet (the verdict arms + the
    emit arm are one more set of consumers of the grid the
    grouping-set-pruning gotcha would otherwise re-scan per arm), the
    1-row chosen-level join is a broadcast, and the noise is a
    scan-side projection — no Python, no cartesian."""
    plan = _plan(spark, "dq_release_emit")
    assert plan.count("FileScan parquet") == 0, plan
    assert "Scan ExistingRDD" in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_chunk_doc_survival_materialized_labels_plan(spark):
    """dedup_chunk_doc_survival (round 14): the CC labels arrive
    materialized (Scan ExistingRDD), nothing is forced broadcast on
    the doc_id join (both sides stay partitionable at 100 TB), and
    the report stays JVM-side with no cartesian."""
    plan = _plan(spark, "dedup_chunk_doc_survival")
    assert "Scan ExistingRDD" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_chunk_incremental_no_corpus_self_join(spark):
    """dedup_chunk_incremental (round 14): candidate generation must be
    the (band, bkey) equi-join of the BATCH band rows against the
    corpus band rows — never a corpus self-pairing, never a cartesian,
    never Python. Both parity filters must reach the documents scan
    (pushed, so each side reads only its slice)."""
    plan = _plan(spark, "dedup_chunk_incremental")
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "bkey" in plan, plan


def test_pipeline_mmr_serving_grid_only_plan(spark):
    """pipeline_mmr_serving (round 14): the IVF candidate stage runs at
    build time into the checkpointed candidate grid and the greedy
    steps are checkpointed exactly like sim_mmr_rerank — the returned
    plan must read ONE materialized grid, zero parquet (serving cost
    independent of corpus size), no cartesian, no Python."""
    plan = _plan(spark, "pipeline_mmr_serving")
    assert "Scan ExistingRDD" in plan, plan
    assert ".parquet" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_dedup_chunk_keep_anti_join_writer_plan(spark):
    """dedup_chunk_keep (round 14): the writer relation must be the
    LEFT ANTI hash join of the full chunk grain against the
    materialized drop set plus the rep-flag left join — no cartesian,
    no Python, labels from Scan ExistingRDD."""
    plan = _plan(spark, "dedup_chunk_keep")
    assert "Scan ExistingRDD" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_dp_epsilon_curve_single_count_broadcast_grid(spark):
    """dp_epsilon_curve (round 14): ONE map-side-combinable count per
    language (a single documents scan), the 4-row epsilon grid
    broadcast onto the bounded aggregate, noise as a scan-side
    projection — no window, no data-sized join, no Python."""
    plan = _plan(spark, "dp_epsilon_curve")
    assert plan.count("documents.parquet") == 1, plan
    assert "partial_count" in plan, plan
    assert "windowspecdefinition" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
