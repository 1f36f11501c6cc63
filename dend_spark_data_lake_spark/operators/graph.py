"""Distributed connected components over an edge DataFrame.

The piece that turns near-duplicate PAIRS (similarity.py) into dedup
CLUSTERS: docs {a,b}, {b,c} are one duplicate group even though (a,c) was
never emitted as a pair. At 100 TB the pair relation does not fit on the
driver, so clustering must itself be a dataflow — this module implements
iterative min-label propagation with per-round lineage truncation.

Reference parity: the reference (mahdi-hosseini/dend_spark_data_lake) has
no graph/dedup-cluster surface; this is part of the driver-mandated
LLM-pipeline extension (SURVEY.md §2.5, fuzzy dedup).

Scale notes:
- Each round is one shuffle join (edges ⋈ labels on dst) + one grouped min
  — both hash-partitioned on the same key, so AQE reuses the exchange.
- Rounds needed = graph diameter. Near-dup clusters are dense (diameter
  2-4 in practice), so the loop terminates in a handful of rounds; the
  ``max_rounds`` guard bounds pathological chains.
- ``localCheckpoint`` after every round truncates the logical plan —
  without it the plan doubles per iteration and Catalyst analysis time
  dominates by round ~8. On a real cluster with HDFS, ``checkpoint()``
  (reliable) is the production choice; local mode uses the block-store
  variant.
- Convergence is detected from ``sum(label)``: labels only ever decrease,
  so the sum is strictly monotone until fixpoint — one cheap aggregate per
  round instead of a change-count join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 25,
) -> DataFrame:
    """Label every vertex of the undirected graph ``edges`` with the
    minimum vertex id of its connected component.

    Returns ``(vertex, component)``; isolated vertices never appear in
    ``edges`` and therefore are not returned (callers keep them implicitly
    — see ``dedup_corpus``).
    """
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = sym.union(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sym = sym.dropDuplicates().localCheckpoint()

    labels = (
        sym.select(F.col("u").alias("vertex"))
        .dropDuplicates()
        .withColumn("component", F.col("vertex"))
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum("component")).collect()[0][0]

    converged = False
    for _ in range(max_rounds):
        # component'(v) = min(component(v), min over neighbors u of component(u))
        nbr_min = (
            sym.join(labels, sym["u"] == labels["vertex"])
            .groupBy(F.col("v").alias("vertex2"))
            .agg(F.min("component").alias("nbr_component"))
        )
        labels = (
            labels.join(nbr_min, labels["vertex"] == nbr_min["vertex2"], "left")
            .select(
                "vertex",
                F.least(
                    F.col("component"),
                    F.coalesce("nbr_component", F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("component")).collect()[0][0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # Exiting via max_rounds means propagation stopped before the
        # fixpoint: a component whose diameter exceeds max_rounds would be
        # returned with MULTIPLE labels — silently wrong dedup clusters.
        raise RuntimeError(
            f"connected_components did not converge within {max_rounds} "
            "rounds; the graph has a component with a longer path — "
            "raise max_rounds"
        )
    return labels
