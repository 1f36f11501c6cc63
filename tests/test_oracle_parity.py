"""Local replica of the driver's correctness gate: every registered query
with an oracle must match DuckDB at sf0.001 (fast) — the driver runs the
same comparison at sf0.01."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_utils import duckdb_connection, compare

from dend_spark_data_lake_spark.queries import REGISTRY

ORACLE_NAMES = [n for n, s in REGISTRY.items() if s.oracle is not None]
ROWS_ONLY_NAMES = [n for n, s in REGISTRY.items() if s.oracle is None]

# Default-tier parity subset (VERDICT r14 ask #2: the full 381-replay
# pass is ~14 min of the suite — more than the driver's verify budget
# can carry). The DEFAULT tier keeps exactly the parity checks with the
# highest regression value; the FULL parity sweep runs in the nightly
# tier (-m nightly) and via tools/oracle_sweep.py, which every round's
# end-state certification executes at sf0.01 AND sf0.1 anyway:
#   1. the driver's CURRENT 50-query grading window (_GRADE_FIRST) — a
#      hash mismatch there is an instant driver regression;
#   2. every query whose plan was touched by the round-15 optimization
#      pass (the paths most likely to break);
#   3. one representative per name-family prefix, so every operator
#      family keeps an end-to-end replay in the default tier.
from dend_spark_data_lake_spark.queries import _GRADE_FIRST  # noqa: E402

_R15_TOUCHED = {
    "sql_sole_supplier_rewrite", "sql_exists_not_exists",
    "sim_knn_mutual_stats", "dedup_embedding_cosine",
    "dedup_semantic_corpus", "pipeline_ann_serving", "pipeline_ann_rerank",
    "embed_pq_residual_gain", "ann_index_maintenance",
    "embed_pq_bits_tradeoff", "embed_pq_distortion", "dedup_corpus",
    "pipeline_llm_corpus", "dedup_cc_incremental", "split_cluster_safe",
    "pipeline_chunk_dedup", "dedup_clusters", "graph_pagerank_nations",
    "dedup_ngram_jaccard", "dedup_containment", "kmeans_clusters",
    "embed_pca_topvec", "pipeline_curation", "curation_token_budget",
    "market_basket_pairs",
}
_family_rep: dict[str, str] = {}
for _n in ORACLE_NAMES:
    _family_rep.setdefault(_n.split("_")[0], _n)
_DEFAULT_PARITY = (
    (set(_GRADE_FIRST) & set(ORACLE_NAMES))
    | (_R15_TOUCHED & set(ORACLE_NAMES))
    | set(_family_rep.values())
)

_PARITY_PARAMS = [
    n if n in _DEFAULT_PARITY else pytest.param(n, marks=pytest.mark.nightly)
    for n in ORACLE_NAMES
]


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_SMOKE)
    yield c
    c.close()


@pytest.mark.parametrize("name", _PARITY_PARAMS)
def test_oracle_parity(spark, con, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_SMOKE)
    problems = compare(df, con, spec.oracle)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_grading_window_invariants():
    """The driver grades the FIRST 50 registry entries: the window must be
    exactly _GRADE_FIRST with no duplicates anywhere in the rotation
    lists. From round 5 on every window entry must be oracle-backed
    (VERDICT r4 ask #5): the 4 rows-only sketches received their one
    err:no_oracle driver row in r04 and re-windowing them would burn
    certification slots re-recording the same rows."""
    from dend_spark_data_lake_spark.queries import _GRADE_FIRST, _GRADE_NEXT

    names = list(REGISTRY)
    assert len(_GRADE_FIRST) == 50
    assert names[: len(_GRADE_FIRST)] == _GRADE_FIRST
    rows_only = {n for n in (*_GRADE_FIRST, *_GRADE_NEXT) if REGISTRY[n].oracle is None}
    assert rows_only == set(), f"rows-only entries in grading rotation: {rows_only}"
    rotation = [*_GRADE_FIRST, *_GRADE_NEXT]
    assert len(rotation) == len(set(rotation))


# The round whose grading window _GRADE_FIRST currently encodes, and the
# oldest-cohort round it drains. Bump BOTH at each rotation. The policy
# test below pins the WINDOW-CUT state: it must only read artifacts from
# rounds BEFORE the window round, because the window's own certificate
# (CORRECTNESS_r{WINDOW_ROUND}.json) lands mid-round and would otherwise
# flip every entry's latest_round to the new round and contradict the
# invariants the instant grading succeeds (the r11 defect — VERDICT r11
# ask #1; the r10 defect was the converse, a glob that dropped two-digit
# rounds entirely).
WINDOW_ROUND = 14
RECERT_COHORT = 7


def test_round14_window_rotation_policy():
    """The round-14 window (VERDICT r13 "what's missing" #1) must lead
    with every oracle-backed entry that has NO driver row in rounds
    before the window cut (the nine round-13 additions), then drain the
    last 8 r06-only re-certs, then re-certify the r07 cohort
    oldest-certificate-first — so every re-cert slot's MOST RECENT
    pre-cut driver certificate is r06 or older and the certificate
    rounds are non-decreasing across the window. Derived from the
    actual CORRECTNESS_r*.json artifacts, not from our own rotation
    lists — but ONLY artifacts with round < WINDOW_ROUND, so the test
    stays green when this round's own certificate (and any later one)
    lands on disk. Idempotence to grading is structural — the
    enumeration's upper bound comes from WINDOW_ROUND in the filter
    below, not from what files exist — so no runtime assert re-checks
    it (one would be a tautology of the filter). The glob and round
    parse stay two-digit-safe — guarded by asserting the r10 and r11
    artifacts are in the enumeration."""
    import json
    import re
    from pathlib import Path

    from dend_spark_data_lake_spark.queries import _GRADE_FIRST, _GRADE_NEXT

    repo = Path(__file__).resolve().parent.parent
    artifacts = sorted(
        (
            p
            for p in repo.glob("CORRECTNESS_r*.json")
            if int(re.fullmatch(r"CORRECTNESS_r(\d+)", p.stem).group(1))
            < WINDOW_ROUND
        ),
        key=lambda p: int(re.fullmatch(r"CORRECTNESS_r(\d+)", p.stem).group(1)),
    )
    if len(artifacts) < 10:
        pytest.skip("driver correctness artifacts not present")
    rounds_seen = {
        int(re.fullmatch(r"CORRECTNESS_r(\d+)", p.stem).group(1))
        for p in artifacts
    }
    assert {10, 11} <= rounds_seen, (
        "two-digit artifacts missing from the enumeration — glob regression"
    )

    latest_round: dict[str, int] = {}
    for p in artifacts:
        rnd = int(re.fullmatch(r"CORRECTNESS_r(\d+)", p.stem).group(1))
        for name in json.loads(p.read_text()):
            latest_round[name] = max(latest_round.get(name, 0), rnd)

    oracle_backed = {n for n, s in REGISTRY.items() if s.oracle is not None}
    never_graded = oracle_backed - set(latest_round)
    # never-graded entries either lead the WINDOW (they existed when the
    # round-13 window was cut) or sit at the FRONT of the queue (round-14
    # additions made after the window froze — the graded surface stays
    # untouched between rotation and grading)
    in_window = never_graded & set(_GRADE_FIRST)
    queued = never_graded - in_window
    k = len(in_window)
    assert set(_GRADE_FIRST[:k]) == in_window, (
        f"never-graded entries must lead the window: "
        f"{in_window ^ set(_GRADE_FIRST[:k])}"
    )
    assert set(_GRADE_NEXT[: len(queued)]) == queued, (
        f"never-graded additions must head the queue: "
        f"{queued ^ set(_GRADE_NEXT[: len(queued)])}"
    )
    # re-cert slots: oldest certificates first (non-decreasing rounds),
    # none fresher than the cohort now being re-certified
    recerts = [latest_round[n] for n in _GRADE_FIRST[k:]]
    assert all(r <= RECERT_COHORT for r in recerts), (
        f"window re-grades entries with fresh (r{RECERT_COHORT + 1:02d}+) "
        f"rows: "
        f"{[n for n in _GRADE_FIRST[k:] if latest_round[n] > RECERT_COHORT]}"
    )
    assert recerts == sorted(recerts), (
        "window re-certs must run oldest-certificate-first"
    )
    queued_stale = [
        n
        for n in _GRADE_NEXT[len(queued):]
        if latest_round.get(n, 0) > RECERT_COHORT
    ]
    assert not queued_stale, f"queue holds fresh-certificate entries: {queued_stale}"


@pytest.mark.nightly  # heavyweight replay: default tier must fit the driver's verify budget (r15)
def test_no_nested_types_in_oracle_backed_outputs(spark):
    """The driver's pandas canonicalizer sorts/hashes scalar cells only —
    an ArrayType/MapType/StructType output column crashes it with
    'unhashable type'. This bit agg_quantiles (r1) and agg_order_history
    (r2); guard the whole registry so the class can't recur. Mostly
    schema-only (plans build lazily), but iterative entries such as
    kmeans_clusters do execute driver-side collects at SF_SMOKE to
    produce their schema — the test is cheap, not free."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = []
    for name in ORACLE_NAMES:
        df = REGISTRY[name].fn(spark, SF_SMOKE)
        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders.append(f"{name}: {bad}")
    assert not offenders, (
        "oracle-backed queries with nested output columns "
        "(driver canonicalizer cannot hash them): " + "; ".join(offenders)
    )


def test_no_hugeint_or_decimal_in_oracle_types(con):
    """The driver's hasher is dtype-sensitive: a DuckDB HUGEINT (any
    unwrapped integer ``sum()``) or DECIMAL column materializes as Python
    objects, not int64, and hash-mismatches an otherwise value-identical
    Spark result. The value-normalizing ``compare`` above provably cannot
    catch this class — it produced all four r03 reds (sql_top_supplier,
    text_commonness, sql_market_share, sql_promo_revenue). Bind every
    oracle and reject HUGEINT/UHUGEINT/DECIMAL/nested columns outright.
    Binding a relation types it without executing it, so this is cheap."""
    offenders = []
    for name in ORACLE_NAMES:
        rel = con.sql(REGISTRY[name].oracle)
        bad = [
            f"{c}:{t}"
            for c, t in zip(rel.columns, map(str, rel.types))
            if "HUGEINT" in t
            or t.startswith("DECIMAL")
            or any(k in t for k in ("STRUCT", "MAP(", "[]"))
        ]
        if bad:
            offenders.append(f"{name}: {bad}")
    assert not offenders, (
        "oracles emitting driver-hostile DuckDB types (wrap the outer "
        "aggregate in CAST(... AS BIGINT) — see module header convention): "
        + "; ".join(offenders)
    )


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, name):
    df = REGISTRY[name].fn(spark, SF_SMOKE)
    n = df.count()
    assert n >= 0
    assert df.columns  # stable schema


# ---------------------------------------------------------------------------
# Negative controls for the comparator itself (VERDICT r5 ask #4)
# ---------------------------------------------------------------------------
# An all-green board is exactly when a silent comparator bug costs the
# most: these tests feed compare() inputs that MUST mismatch and assert
# it says so. Each control targets one defect class the harness exists
# to catch.


def test_compare_detects_mutated_query_threshold(spark, con):
    """End-to-end control on a real registry query: run ref_pricing_summary's
    Spark plan against its own oracle mutated by an off-by-one shipdate
    threshold — the exact silent-defect shape the gate exists for."""
    spec = REGISTRY["ref_pricing_summary"]
    df = spec.fn(spark, SF_SMOKE)
    assert compare(df, con, spec.oracle) == []  # sanity: unmutated matches
    assert "1998-09-02" in spec.oracle
    mutated = spec.oracle.replace("1998-09-02", "1998-09-03")
    assert mutated != spec.oracle
    problems = compare(df, con, mutated)
    assert problems, "comparator passed an off-by-one threshold mutation"


def test_compare_detects_value_mutation(spark, con):
    """A single cell off by one in an aggregate must fail the hash leg
    even when row count and schema agree."""
    df = spark.createDataFrame([(1, 10), (2, 20)], "k int, v int")
    assert compare(df, con, "SELECT * FROM (VALUES (1, 10), (2, 20)) t(k, v)") == []
    problems = compare(df, con, "SELECT * FROM (VALUES (1, 10), (2, 21)) t(k, v)")
    assert problems and any("row" in p for p in problems)


def test_compare_detects_row_count_mutation(spark, con):
    df = spark.createDataFrame([(1,), (2,)], "k int")
    problems = compare(df, con, "SELECT * FROM (VALUES (1,), (2,), (3,)) t(k)")
    assert any("row count differs" in p for p in problems)


def test_compare_detects_column_rename(spark, con):
    """The driver sorts columns by NAME before hashing — a mis-aliased
    aggregate must be caught at the schema leg, not silently pass."""
    df = spark.createDataFrame([(1, 2)], "k int, sum_qty int")
    problems = compare(df, con, "SELECT 1 AS k, 2 AS total_qty")
    assert any("columns differ" in p for p in problems)


def test_compare_detects_null_vs_value(spark, con):
    df = spark.createDataFrame([(1, None)], "k int, v int")
    problems = compare(df, con, "SELECT 1 AS k, 0 AS v")
    assert problems


def test_compare_detects_swapped_rows_across_columns(spark, con):
    """Order-insensitive canonicalization must not be PERMUTATION-
    insensitive: transposing values between rows within a column is a
    real defect and must still mismatch."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string")
    problems = compare(
        df, con, "SELECT * FROM (VALUES (1, 'b'), (2, 'a')) t(k, s)"
    )
    assert problems
