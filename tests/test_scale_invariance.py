"""Scale-degradation tier (VERDICT r4 ask #6b): the 10 most expensive
registry queries must keep an INVARIANT physical-plan shape when
``spark.sql.shuffle.partitions`` is forced far below (4) and far above
(256) the tuned value, at the bench scale factor (sf0.1).

Why this matters at 100 TB: partition count is the one knob an operator
must never encode semantics in. A plan whose join strategy, shuffle
count, aggregate structure, or global-sort count CHANGES with the
partition setting is leaning on a local[32] coincidence — e.g. a
broadcast that silently becomes a shuffle join, or a windowed rank that
acquires a global sort — and will degrade non-linearly when a cluster
operator retunes partitions for real data volumes. Shape here means the
multiset of plan operators that carry scale semantics; partition NUMBERS
inside the plan are expected to differ and are excluded.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest

from dend_spark_data_lake_spark.queries import REGISTRY

SF_BENCH = "/root/testdata/sf0.1"

# the 10 most expensive queries by BENCH median (headline + secondary),
# i.e. the ones whose plans matter most at 100x
SCALE_QUERIES = [
    "kmeans_clusters",
    "pipeline_llm_corpus",
    "pipeline_incremental_ingest",
    "embed_pca_topvec",
    "dedup_ngram_jaccard",
    "graph_pagerank_nations",
    "dedup_corpus",
    "pipeline_curation",
    "dedup_containment",
    "text_bigram_surprisal",
    # round-6 additions whose docstrings make multi-stage shape claims
    "curation_token_budget",
    "dedup_cc_incremental",
    # round-7 additions: the broadcast-LM selection and the shelf-probe
    # sampler must keep their broadcast/anti-join shapes at any partition
    # setting (sim_knn_mutual_stats is excluded: its builder materializes
    # a measured persist, which the cache-clearing fixture would re-run
    # twice at sf0.1 for no shape information — its shape is covered by
    # the test_plans lock)
    "curation_dsir_importance",
    "rec_negative_sampling",
    # round-8 additions: the pid-window machinery consumers whose
    # persist-backed two-branch plan must keep its shape at any
    # partition setting (the round-8 boundary-divergence fix lives
    # exactly here), and the PQ fan-out whose codebook must stay
    # broadcast
    "stats_kruskal_wallis",
    "sample_systematic",
    "embed_pq_distortion",
    # round-9 additions: the ANN serving composite's candidate/ADC joins
    # must keep their broadcast/equi shapes, and the BPE trajectory must
    # stay join-free, at any partition setting. Both builders run driver
    # collects (trained codebook / merge argmaxes) whose results must be
    # IDENTICAL under both forcings for the shapes to even compare —
    # the tier exercises that determinism for free.
    "pipeline_ann_serving",
    "tokenize_bpe_merge_trajectory",
    # round-10 addition: the BPE serving composite — the trained-merge
    # literal replaces and the word-keyed encode equi-join must keep
    # their shapes at any partition setting (the join STRATEGY may flip
    # broadcast<->shuffle with size estimates, which the shape counter
    # tolerates only if it doesn't — so the tier pins the vocabulary
    # estimate staying under the threshold at bench SF; a flip would
    # surface as a shape diff and deserves a look, not a silent pass)
    "pipeline_bpe_encode",
]

# operators whose COUNT defines the scale shape of a plan: join
# strategies, shuffle boundaries, aggregate structure, top-k vs sort,
# window operators. Project/Filter/scan-detail lines are formatting
# noise and excluded.
_SHAPE_OPS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "Exchange",
    "BroadcastExchange",
    "TakeOrderedAndProject",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "Window",
    "Generate",
    "FlatMapGroupsInPandas",
    "MapInPandas",
)

_OP_RE = re.compile(r"^[\s:+\-*(]*([A-Za-z][A-Za-z0-9]*)")


def _shape(plan: str) -> Counter:
    counts: Counter = Counter()
    for line in plan.splitlines():
        m = _OP_RE.match(line)
        if not m:
            continue
        op = m.group(1)
        if op == "Exchange":
            # distinguish shuffle kinds but not partition numbers
            kind = "range" if "rangepartitioning" in line else (
                "single" if "SinglePartition" in line else "hash"
            )
            counts[f"Exchange[{kind}]"] += 1
        elif op == "Sort":
            # a GLOBAL sort (flag `true`) is a scale hazard; count it
            # separately from the benign in-partition sorts under
            # SMJ/Window, whose count follows the join/window ops
            if re.search(r"\],\s*true", line):
                counts["Sort[global]"] += 1
        elif op in _SHAPE_OPS:
            counts[op] += 1
    return counts


def _plan_shape(spark, name: str) -> Counter:
    # hermetic per-build: a relation persisted by an EARLIER query build
    # (e.g. PPJoin's candidate cache inside pipeline_llm_corpus) would be
    # cache-substituted into this plan and change its printed shape —
    # that's cache state, not a partition-count effect
    spark.catalog.clearCache()
    df = REGISTRY[name].fn(spark, SF_BENCH)
    return _shape(df._jdf.queryExecution().executedPlan().toString())


@pytest.fixture(scope="module")
def shapes(spark):
    """Plan shape per query under the low and high partition forcings.
    Computed once for the module; conf restored even on failure."""
    key = "spark.sql.shuffle.partitions"
    orig = spark.conf.get(key)
    out: dict[str, dict[int, Counter]] = {n: {} for n in SCALE_QUERIES}
    try:
        for parts in (4, 256):
            spark.conf.set(key, str(parts))
            for name in SCALE_QUERIES:
                out[name][parts] = _plan_shape(spark, name)
    finally:
        spark.conf.set(key, orig)
    return out


@pytest.mark.parametrize("name", SCALE_QUERIES)
def test_plan_shape_invariant_under_partition_forcing(shapes, name):
    lo, hi = shapes[name][4], shapes[name][256]
    assert lo == hi, (
        f"{name}: plan shape depends on spark.sql.shuffle.partitions\n"
        f"  at 4:   {dict(lo)}\n  at 256: {dict(hi)}\n"
        f"  diff:   {dict((lo - hi) + (hi - lo))}"
    )


@pytest.mark.parametrize("name", SCALE_QUERIES)
def test_no_cartesian_and_bounded_global_sorts(shapes, name):
    """Companion hard bounds at BOTH forcings: never a cartesian product,
    and at most one global sort (the presentation orderBy)."""
    for parts, shape in shapes[name].items():
        assert shape["CartesianProduct"] == 0, (name, parts, dict(shape))
        assert shape["Sort[global]"] <= 1, (name, parts, dict(shape))


# queries whose broadcasts must come from EXPLICIT hints, with the
# minimum broadcast-join count each must retain when the auto threshold
# is disabled. At 100 TB the optimizer's stats exceed any threshold, so
# a broadcast that exists only because the dim is small-at-test-SF will
# silently become a shuffle join in production — hints are the contract.
HINTED_BROADCASTS = [
    ("ref_star_join", 1),
    ("agg_region_revenue", 3),
    ("dedup_corpus", 1),       # the drop-list anti-join
    ("winsorize_prices", 1),   # the percentile cut table
    ("customer_ltv_deciles", 1),  # the partition offset table
    ("dq_benford_first_digit", 1),  # the 1-row total
    ("profile_psi_event_types", 1),
    ("text_bigram_surprisal", 1),  # the vocab scalar
    ("agg_ship_priority", 1),       # the segment-filtered customer dim
    ("tokenize_with_vocab", 1),     # the top-500 vocab map
    ("sample_temperature_by_lang", 1),  # the per-lang threshold table
    ("text_length_band", 1),        # the [p5, p95] bounds scalar
    ("sql_product_profit", 3),      # part / supplier / nation dims
    ("vocab_oov_rate", 1),          # the top-20 vocabulary
    ("split_cluster_safe", 1),      # the cluster-label relation
    ("agg_weighted_median", 1),     # the grid offset table
]


@pytest.mark.parametrize("name,min_bhj", HINTED_BROADCASTS)
def test_broadcasts_survive_disabled_auto_threshold(spark, name, min_bhj):
    """With spark.sql.autoBroadcastJoinThreshold=-1 (the state a 100 TB
    plan is effectively in), the explicit broadcast() hints must still
    produce at least the same broadcast joins — none of these queries
    may be leaning on size-based auto-broadcast."""
    key = "spark.sql.autoBroadcastJoinThreshold"
    orig = spark.conf.get(key)
    try:
        spark.conf.set(key, "-1")
        spark.catalog.clearCache()
        df = REGISTRY[name].fn(spark, SF_BENCH)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(key, orig)
    n = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    assert n >= min_bhj, f"{name}: only {n} broadcast joins with auto-broadcast off\n{plan[:2000]}"


# ---------------------------------------------------------------------------
# Registry-wide shape invariance at smoke scale
# ---------------------------------------------------------------------------
# The 10 expensive queries above get the sf0.1 treatment; every OTHER
# registry query gets the same check at sf0.001 where plan builds are
# cheap — the guarantee becomes "NO query's physical-plan shape depends
# on spark.sql.shuffle.partitions", not just the top of the cost table.

from tests.conftest import SF_SMOKE

BROAD_QUERIES = [n for n in REGISTRY if n not in SCALE_QUERIES]


@pytest.fixture(scope="module")
def broad_shapes(spark):
    key = "spark.sql.shuffle.partitions"
    orig = spark.conf.get(key)
    out: dict[str, dict[int, Counter]] = {}
    try:
        for parts in (4, 256):
            spark.conf.set(key, str(parts))
            for name in BROAD_QUERIES:
                spark.catalog.clearCache()
                df = REGISTRY[name].fn(spark, SF_SMOKE)
                out.setdefault(name, {})[parts] = _shape(
                    df._jdf.queryExecution().executedPlan().toString()
                )
    finally:
        spark.conf.set(key, orig)
    return out


@pytest.mark.nightly  # heavyweight replay: default tier must fit the driver's verify budget (r15)
@pytest.mark.parametrize("name", BROAD_QUERIES)
def test_broad_plan_shape_invariant(broad_shapes, name):
    lo, hi = broad_shapes[name][4], broad_shapes[name][256]
    assert lo == hi, (
        f"{name}: plan shape depends on spark.sql.shuffle.partitions\n"
        f"  at 4:   {dict(lo)}\n  at 256: {dict(hi)}\n"
        f"  diff:   {dict((lo - hi) + (hi - lo))}"
    )
