"""Distribution diagnostics for partition/shuffle planning.

At 100 TB, the difference between a smooth run and a straggler-bound one is
usually a handful of heavy keys. Before choosing a join/agg strategy
(broadcast vs salted vs AQE skew split), a pipeline should MEASURE the key
distribution; this module is that measurement as a first-class operator.

Everything here is one map-side-combinable aggregation over the key column
(the only shuffle is by the profiled key itself, at one row per distinct
key) followed by a TakeOrdered top-N — no full sort, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def key_skew_profile(df: DataFrame, key: str | Column, top_n: int = 10) -> DataFrame:
    """Top-``top_n`` heaviest keys with exact row counts and integer
    parts-per-million share of the table — the direct input to a
    salt-or-broadcast decision. Share is computed as
    ``(n * 1_000_000) DIV total`` so every emitted value is engine-exact.

    Ordering is (count DESC, key ASC): fully deterministic under ties, so
    the emitted set is reproducible and oracle-checkable.
    """
    kc = key if isinstance(key, Column) else F.col(key)
    # Persist the per-key counts: both the grand total and the top-N read
    # it, so the fact table is scanned ONCE. The cached relation is one
    # row per distinct key — the small end of the pipeline, and disk-backed
    # if a billion-key profile outgrows executor memory.
    counts = (
        df.groupBy(kc.alias("key_value"))
        .agg(F.count("*").cast("long").alias("n_rows"))
        .persist()
    )
    total = counts.agg(F.sum("n_rows").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .orderBy(F.col("n_rows").desc(), F.col("key_value").asc())
        .limit(top_n)
        .select(
            "key_value",
            "n_rows",
            F.expr("CAST((n_rows * 1000000) DIV __total AS BIGINT)").alias(
                "share_ppm"
            ),
        )
    )


def join_fanout_profile(
    left: DataFrame,
    right: DataFrame,
    key: str,
    top_n: int = 10,
) -> DataFrame:
    """Pre-flight join cardinality check: the EXACT number of output rows
    each key would contribute to ``left JOIN right ON key`` (count_left x
    count_right), top-``top_n`` keys by contribution — run this before a
    100 TB many-to-many join to catch the key that would explode it.

    Two per-key count aggregates + a join of the count tables (one row
    per distinct key, the small relation) — the actual join's output is
    never materialized. All values are exact integer products; ordering
    breaks ties by key, so the result is deterministic.
    """
    lc = (
        left.groupBy(F.col(key).alias("key_value"))
        .agg(F.count("*").cast("long").alias("n_left"))
    )
    rc = (
        right.groupBy(F.col(key).alias("key_value"))
        .agg(F.count("*").cast("long").alias("n_right"))
    )
    return (
        lc.join(rc, "key_value")
        .select(
            "key_value",
            "n_left",
            "n_right",
            (F.col("n_left") * F.col("n_right")).alias("out_rows"),
        )
        .orderBy(F.col("out_rows").desc(), F.col("key_value").asc())
        .limit(top_n)
    )


def plan_audit(df: DataFrame) -> dict:
    """Physical-plan audit of a DataFrame BEFORE running it: counts of the
    plan features that decide whether a job survives a 100x scale-up.

    Returns a dict with:

    - ``exchanges``: shuffle boundaries (each is a full materialization of
      the stream — the unit of cost to minimize);
    - ``broadcast_joins`` / ``sort_merge_joins`` / ``shuffled_hash_joins``:
      the join-strategy mix (a SortMergeJoin against a small dim is a
      missed broadcast);
    - ``nested_loop_joins`` / ``cartesian``: the quadratic red flags — any
      non-zero value here on a large input is a scale killer;
    - ``scans_with_pushdown`` / ``scans``: how many file scans actually
      received pushed filters (a filtered query whose scan shows
      ``PushedFilters: []`` re-reads everything);
    - ``codegen_spans``: whole-stage codegen regions (wider is better —
      Python UDFs and some exprs break them); NOTE under AQE the
      pre-execution plan reports 0 — spans materialize in final plans.

    This is the pre-flight the other diagnostics feed into: run it in CI
    against known queries and assert the counts (tests/test_plans.py does
    exactly that), so a refactor that silently degrades a plan fails the
    build, not the cluster.
    """
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    # An executed AQE plan prints BOTH "== Final Plan ==" and
    # "== Initial Plan ==" — audit only the final section, or every
    # counter double-counts after the query has run once.
    if "== Final Plan ==" in plan:
        plan = plan.split("== Final Plan ==", 1)[1].split("== Initial Plan ==", 1)[0]
    pushed = sum(
        1
        for line in plan.splitlines()
        if "PushedFilters: [" in line and "PushedFilters: []" not in line
    )
    return {
        # shuffle boundaries only: "Exchange" also substring-matches
        # BroadcastExchange (not a shuffle) and ReusedExchange (already
        # counted once at its definition site)
        "exchanges": (
            plan.count("Exchange")
            - plan.count("BroadcastExchange")
            - plan.count("ReusedExchange")
        ),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "shuffled_hash_joins": plan.count("ShuffledHashJoin"),
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "scans": plan.count("FileScan") + plan.count("BatchScan"),
        "scans_with_pushdown": pushed,
        # codegen renders as "*(N) Operator" prefixes; count DISTINCT span
        # ids, not occurrences (every operator in a span carries the prefix)
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
    }
